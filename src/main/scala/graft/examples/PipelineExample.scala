package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.{D7DupClusters, D8BloomDedup, T1LangId, T4Fingerprint, T8Repetition, T9BigramLm}

/** End-to-end training-data curation pipeline composed from the engine's
  * own operators — the workflow a 100 TB corpus actually goes through, in
  * the order that minimizes bytes touched by the expensive stages:
  *
  *   1. QUALITY GATE (cheap, per-row, scan-bound): language-consistency
  *      check (t1's detected language must agree with the declared `lang`
  *      metadata — mislabeled docs poison language-filtered training sets)
  *      and repetition filters (t8) — drops degenerate docs before
  *      anything that shuffles.
  *   2. INCREMENTAL ADMISSION (broadcast probe + verify): Bloom filter
  *      (d8) against the "already ingested" even half. A miss proves the
  *      doc new — admitted outright, nothing else touches it. Only the
  *      hits (true duplicates + Bloom false positives) pay the exact
  *      check: a content-hash semi-join against the reference half, which
  *      at scale runs over the tiny hit subset, not the corpus.
  *   3. NEAR-DEDUP (bucketed LSH + components): d7's connected components
  *      over the verified duplicate pairs; each cluster keeps its smallest
  *      ADMITTED member (transitively, not per-pair — and never losing a
  *      cluster's content just because its global-min member was rejected
  *      upstream).
  *   4. RANKING (two grouped counts + an n-gram join): bigram-LM score
  *      (t9), highest-quality survivors first.
  *
  * Each stage reads the previous stage's output frame — no intermediate
  * hits the driver; the only driver-side values are the printed counts.
  * Stage outputs that feed both a count and the next stage are persisted,
  * so each stage computes once.
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

    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. Quality gate: language metadata consistent with the detector, and
    // not repetition-flagged.
    val langOk = T1LangId.run(spark, sfDir)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("pred_lang") === col("lang"))
      .select(col("doc_id"))
    val rep = T8Repetition.run(spark, sfDir).filter(!col("flagged")).select(col("doc_id"))
    val quality = graft.CacheScope.persisted(langOk.join(rep, "doc_id"))

    // 2. Incremental admission. Bloom misses are admitted with no further
    // work; hits are exactly verified — admitted only if their normalized
    // content hash (t4's fingerprint, the exact operator d8's probe hash
    // derives from) does NOT actually occur in the reference half.
    val fp = T4Fingerprint.run(spark, sfDir)
    val refFps = fp.filter(col("doc_id") % 2 === 0).select(col("fp")).distinct()
    val hitsVerified = D8BloomDedup.run(spark, sfDir).filter(col("bloom_hit"))
      .join(fp, "doc_id")
      .join(refFps, Seq("fp"), "left_semi")
      .select(col("doc_id"))
    val probeIds = docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
    val admitted = graft.CacheScope.persisted(quality
      .join(probeIds, "doc_id")
      .join(hitsVerified, Seq("doc_id"), "left_anti"))

    // 3. Near-dedup: keep ONE admitted representative per duplicate cluster
    // — the smallest ADMITTED doc_id of each component, not the component's
    // global min label: a cluster whose min-id member was itself rejected
    // upstream (quality gate, admission) must still keep its content
    // through a surviving representative, not lose it entirely.
    val components = D7DupClusters.run(spark, sfDir)
    val withComponent = admitted
      .join(components, Seq("doc_id"), "left")
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val keepers = withComponent.groupBy(col("component"))
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = graft.CacheScope.persisted(withComponent
      .join(keepers, Seq("component", "doc_id"), "left_semi")
      .drop("component"))

    // 4. Rank survivors by LM quality score, best first.
    val ranked = T9BigramLm.run(spark, sfDir)
      .join(deduped, "doc_id")
      .orderBy(col("avg_logp").desc)

    // 5. Mixture sampling: weight the SURVIVOR set to the target source
    // mix (p3's library form over the cleaned frame, not the raw corpus).
    val mixed = graft.queries.P3MixtureSample.sample(
      deduped.join(docs.select(col("doc_id"), col("source")), "doc_id"))
      .select(col("doc_id"))

    // 6. Sequence packing: lay the mixed survivors out as seqLen-token
    // training chunks (p2's library form — deterministic shuffled order,
    // distributed token prefix-sum).
    val packed = graft.queries.P2SequencePack.pack(
      spark,
      mixed.join(graft.queries.T3TokenCount.run(spark, sfDir)
        .select(col("doc_id"), col("ws_tokens").as("n_tokens")), "doc_id"),
      partitions = spark.sparkContext.defaultParallelism)

    val nQuality = quality.count()
    val nAdmitted = admitted.count()
    val nDeduped = deduped.count()
    val nMixed = mixed.count()
    val nChunks = packed.agg(max(col("end_chunk"))).collect()(0).getLong(0) + 1
    val top = ranked.select(col("doc_id"), col("avg_logp")).limit(3).collect()
      .map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(", ")
    println(s"corpus=$total -> quality=$nQuality -> admitted=$nAdmitted " +
      s"-> post-dedup=$nDeduped -> mixed=$nMixed -> packed into $nChunks " +
      s"chunks of ${graft.queries.P2SequencePack.seqLen} tokens; " +
      s"top docs by LM score: $top")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.stop()
  }
}
