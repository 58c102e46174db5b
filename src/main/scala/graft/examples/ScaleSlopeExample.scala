package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps
import graft.queries.MinhashLsh

/** Reproducible scale-slope probe for the dedup pipeline: replicates the
  * sf0.1 documents corpus k× (disjoint doc_id ranges, so replicas are
  * near-duplicates ACROSS copies — the adversarial case for LSH fan-in) and
  * times the full minhash-LSH candidate pipeline at 1× and 10×.
  *
  * The claim under test: signature building and banding are linear in the
  * corpus; only genuinely-colliding pairs cost more. A slope ≤ ~max(10×
  * data, pair growth amortized) demonstrates the shape holds; a
  * super-linear blowup would indicate an accidental all-pairs or a skewed
  * bucket. Timed after one untimed warm pass so janino/JIT compilation is
  * excluded (the same steady-state methodology as Bench).
  */
object ScaleSlopeExample {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(k: Int): DataFrame = {
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      (0 until k).map { i =>
        docs.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"), col("text"))
      }.reduce(_ union _)
    }

    def candidates(k: Int): Long = {
      val n = MinhashLsh.candidatePairsFrom(TextOps.shingleHashSets(corpus(k))).count()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      n
    }

    def timed(k: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = candidates(k)
      ((System.nanoTime() - t0) / 1e9, pairs)
    }

    candidates(1) // warm: codegen/JIT for the whole pipeline shape
    val (t1, p1) = timed(1)
    val (t10, p10) = timed(10)
    println(f"""{"metric":"dedup_scale_slope","t_1x":$t1%.2f,"t_10x":$t10%.2f,"slope":${t10 / t1}%.2f,"pairs_1x":$p1,"pairs_10x":$p10,"sf":"$sfDir"}""")
    spark.stop()
  }
}
