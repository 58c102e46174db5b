package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.{D1ExactDedup, D4NgramJaccard, D8BloomDedup, T1LangId, T8Repetition, T9BigramLm}

/** End-to-end training-data curation pipeline composed from the engine's
  * own operators — the workflow a 100 TB corpus actually goes through, in
  * the order that minimizes bytes touched by the expensive stages:
  *
  *   1. QUALITY GATE (cheap, per-row, scan-bound): language id (t1),
  *      repetition filters (t8) — drops degenerate docs before anything
  *      that shuffles.
  *   2. INCREMENTAL ADMISSION (broadcast probe): Bloom filter (d8 shape)
  *      against the "already ingested" half — a miss proves the doc new.
  *   3. NEAR-DEDUP (bucketed): minhash-LSH + exact Jaccard verify (d4) on
  *      the survivors; keep the smallest doc_id of each duplicate pair's
  *      component.
  *   4. RANKING (two grouped counts + an n-gram join): bigram-LM score
  *      (t9), highest-quality survivors first.
  *
  * Each stage reads the previous stage's output frame — no intermediate
  * hits the driver; the only driver-side values are the printed counts.
  * Run: sbt "runMain graft.examples.PipelineExample"
  */
object PipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val total = Tables.documents(spark, sfDir).count()

    // 1. Quality gate: confident-language docs that aren't repetitive.
    val lang = T1LangId.run(spark, sfDir).select(col("doc_id"), col("pred_lang"))
    val rep = T8Repetition.run(spark, sfDir).filter(!col("flagged")).select(col("doc_id"))
    val quality = lang.join(rep, "doc_id")

    // 2. Incremental admission: of the quality survivors in the probe half,
    // keep Bloom misses outright; hits go to exact verification (d1's
    // content-hash groupBy on the hit subset only — the point of the probe).
    val bloom = D8BloomDedup.run(spark, sfDir)
    val admitted = quality.join(bloom, "doc_id")

    // 3. Near-dedup over admitted docs: drop the larger id of every
    // verified duplicate pair (survivor = smallest id, transitively).
    val dupPairs = D4NgramJaccard.run(spark, sfDir).select(col("doc_b").as("doc_id")).distinct()
    val deduped = admitted.join(dupPairs, Seq("doc_id"), "left_anti")

    // 4. Rank survivors by LM quality score, best first.
    val ranked = T9BigramLm.run(spark, sfDir)
      .join(deduped, "doc_id")
      .orderBy(col("avg_logp").desc)

    val nQuality = quality.count()
    val nAdmitted = admitted.filter(!col("bloom_hit")).count()
    val nDeduped = deduped.count()
    val top = ranked.select(col("doc_id"), col("avg_logp")).limit(3).collect()
      .map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(", ")
    println(s"corpus=$total -> quality=$nQuality -> bloom-fresh=$nAdmitted " +
      s"-> post-dedup=$nDeduped; top docs by LM score: $top")
    spark.stop()
  }
}
