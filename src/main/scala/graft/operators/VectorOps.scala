package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed-dimension vector arithmetic as generated per-component expressions
  * (Column + SQL lockstep). Unrolling the dot product into d codegen'd
  * multiply-adds keeps the whole similarity computation inside
  * WholeStageCodegen AND makes it bit-deterministic across engines (fixed
  * left-associated order; +,*,/,sqrt are all exactly-rounded IEEE ops) —
  * `aggregate()` higher-order folds would be semantically identical but
  * slower and opaque to the oracle.
  *
  * Elements are widened float→double BEFORE any arithmetic so both engines
  * operate on identical doubles.
  */
object VectorOps {

  /** a·b over two array columns of dimension d. */
  def dot(a: Column, b: Column, d: Int): Column =
    (0 until d).map(i =>
      element_at(a, i + 1).cast("double") * element_at(b, i + 1).cast("double"))
      .reduce(_ + _)

  def dotSql(a: String, b: String, d: Int): String =
    (0 until d).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * CAST($b[${i + 1}] AS DOUBLE)").mkString(" + ")

  /** Dot with a constant vector (e.g. an LSH hyperplane). */
  def dotConst(a: Column, v: Seq[Double]): Column =
    v.zipWithIndex.map { case (c, i) =>
      element_at(a, i + 1).cast("double") * lit(c)
    }.reduce(_ + _)

  def dotConstSql(a: String, v: Seq[Double]): String =
    v.zipWithIndex.map { case (c, i) =>
      s"CAST($a[${i + 1}] AS DOUBLE) * ${KMeans.sqlLit(c)}"
    }.mkString(" + ")

  def norm(a: Column, d: Int): Column =
    sqrt((0 until d).map { i =>
      val x = element_at(a, i + 1).cast("double"); x * x
    }.reduce(_ + _))

  def normSql(a: String, d: Int): String =
    "sqrt(" + (0 until d).map(i =>
      s"CAST($a[${i + 1}] AS DOUBLE) * CAST($a[${i + 1}] AS DOUBLE)").mkString(" + ") + ")"

  /** Seeded random hyperplanes for sign-LSH; the constants are inlined into
    * both the Spark plan and the oracle SQL (shortest-roundtrip formatting,
    * so both parse back to the identical double).
    */
  def hyperplanes(nPlanes: Int, d: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(d)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id: bit i = (a·plane_i >= 0). */
  def lshBucket(a: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotConst(a, p) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  def lshBucketSql(a: String, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"CASE WHEN ${dotConstSql(a, p)} >= 0.0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")

  /** Same values as [[lshBucket]] (and the [[lshBucketSql]] oracle mirror —
    * the fused loop's 0.0-seeded left-to-right accumulation is IEEE-identical
    * to the unrolled chain) via one fused dot_product expression per plane
    * instead of a 2·d-node unrolled tree per plane: 12 planes of unrolled
    * 64-dim dots is ~1,500 Catalyst nodes and multiple seconds of janino
    * compile. Requires `DotProduct.register(spark)`.
    */
  def lshBucketFused(a: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(org.apache.spark.sql.graft.DotProduct.dotProduct(a, typedLit(p)) >= 0.0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
