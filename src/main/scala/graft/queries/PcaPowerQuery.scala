package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** k3: top principal component of the embedding corpus by POWER ITERATION —
  * the linear-algebra kernel workload (embedding whitening, spectral
  * diagnostics, IVF/PQ rotation matrices all start from "give me the top
  * eigenvector of XᵀX"). Each iteration is the two-pass distributed matvec:
  *   u_i = ⟨x_i, v⟩        — a per-row projection against the broadcast v,
  *   w_j = avg_i(u_i·x_ij) — ONE 64-column aggregate (w = XᵀXv / n),
  * then the driver normalizes v ← w/‖w‖ — the A4 master-fold shape k1/q9
  * use: per-iteration data volume to the driver is 64 doubles, the corpus
  * never leaves the executors, and the scan projects only the embedding
  * column. 3 iterations; ‖w‖ of the last is the eigenvalue estimate of the
  * mean Gram matrix.
  *
  * Determinism (k1's discipline): the init v₀ = 1/8 per dim is exact in
  * binary (‖v₀‖ = 1); per-iteration averages round to 6 (O(1) magnitudes —
  * reorder noise ~1e-10 against a 5e-7 grid); the norm folds the 64 ROUNDED
  * sums left-to-right identically on both engines (IEEE + is
  * order-sensitive, so the order is pinned, not assumed); normalized
  * components round to 9 before the next matvec. The oracle unrolls the
  * loop as CTEs (VALUES v₀ → u → w → v per iteration).
  */
object K3PcaPower extends GraftQuery {
  val name = "k3_pca_power"
  val describe = "PCA top component: 3 power iterations as two-pass matvec aggregates, unrolled-CTE oracle"

  private val iterations = 3
  private val d = Embeddings.dims
  private val v0 = 0.125 // 1/sqrt(64), exact in binary

  private def round6(x: Double): Double = graft.functions.Rounding.roundTo(x, 6)
  private def round9(x: Double): Double = graft.functions.Rounding.roundTo(x, 9)
  private def sqlLit(x: Double): String = {
    val s = x.toString
    if (s.contains("E") || s.contains("e")) f"$x%.12f" else s
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(col("embedding"))
    def x(j: Int): Column = element_at(col("embedding"), j + 1).cast("double")
    var v = Array.fill(d)(v0)
    var eigval = 0.0
    for (_ <- 1 to graft.core.IterationBudget.effective(iterations)) {
      // u projected ONCE per row (64 multiplies), then 64 avg aggregates
      // read it — not 64 re-computations of the dot product.
      val u = (0 until d).map(j => x(j) * lit(v(j))).reduce(_ + _)
      val proj = e.select(u.as("u"), col("embedding"))
      val aggs = (0 until d).map(j =>
        round(sum(col("u") * x(j)) / count(lit(1)), 6).as(s"w$j"))
      val row = proj.agg(aggs.head, aggs.tail: _*).collect()(0)
      val w = (0 until d).map(row.getDouble).toArray
      // Left-to-right fold in dim order — the exact + order the oracle uses.
      val norm = math.sqrt(w.foldLeft(0.0)((acc, wj) => acc + wj * wj))
      eigval = norm
      v = w.map(wj => round9(wj / norm))
    }
    import spark.implicits._
    v.zipWithIndex.map { case (vj, j) => (j, round6(vj), round6(eigval)) }.toSeq
      .toDF("dim", "loading", "eigval")
  }

  val oracle = {
    def x(alias: String, j: Int) = s"CAST($alias.embedding[${j + 1}] AS DOUBLE)"
    val sb = new StringBuilder
    sb ++= s"WITH v0(${(0 until d).map(j => s"v$j").mkString(", ")}) AS (VALUES (${(0 until d).map(_ => sqlLit(v0)).mkString(", ")}))"
    for (it <- 1 to iterations) {
      val uExpr = (0 until d).map(j => s"${x("e", j)} * v.v$j").mkString(" + ")
      sb ++= s",\nu$it AS (SELECT ($uExpr) AS u, e.embedding FROM embeddings e CROSS JOIN v${it - 1} v)"
      val wCols = (0 until d)
        .map(j => s"round(sum(u * CAST(embedding[${j + 1}] AS DOUBLE)) / count(*), 6) AS w$j")
        .mkString(", ")
      sb ++= s",\nw$it AS (SELECT $wCols FROM u$it)"
      val normExpr = "sqrt(" + (0 until d).map(j => s"w$j * w$j").mkString(" + ") + ")"
      sb ++= s",\nv$it AS (SELECT ${(0 until d).map(j => s"round(w$j / $normExpr, 9) AS v$j").mkString(", ")}, round($normExpr, 6) AS eigval FROM w$it)"
    }
    val arms = (0 until d)
      .map(j => s"SELECT $j AS dim, round(v$j, 6) AS loading, eigval FROM v$iterations")
      .mkString("\nUNION ALL ")
    sb ++= s"\n$arms"
    Some(sb.toString)
  }
}
