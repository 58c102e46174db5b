package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** d9: n-gram CONTAMINATION scoring — for every probe document (odd
  * doc_ids, the "evaluation set"), the fraction of its distinct 3-gram
  * shingles that occur anywhere in the reference half (even doc_ids, the
  * "training corpus"). This is the train/test decontamination check LLM
  * pipelines run before trusting an eval score (the n-gram-overlap method
  * published with GPT-3/PaLM and the open reproductions): d8's Bloom probe
  * answers "have I seen THIS document?", this answers "how much of this
  * document's CONTENT is inside the training set?" — which catches partial
  * inclusion, quotation, and near-duplication that whole-document hashing
  * cannot.
  *
  * Shape at scale: reuses the hashed-shingle pipeline (one md5 per token,
  * arithmetic shingle hashes — the same frame d2/d3/d4 consume, built once
  * per corpus in a real deployment); the reference side collapses to its
  * DISTINCT shingle set (bounded by content volume, not document count) and
  * the overlap is one left join keyed on the shingle hash followed by a
  * per-document aggregate — both shuffles are hash-partitioned on keys with
  * bounded fan-in (a shingle's fan-in is its corpus frequency; a stopword-
  * shingle hot key would salt like any skewed join). Nothing is driver-side
  * and nothing is O(docs²).
  *
  * Flag threshold: ≥ 50% shingle overlap marks a document contaminated —
  * the conventional "substantially included" cut; the exact value is a
  * policy knob, deterministic on both engines either way.
  */
object D9Contamination extends GraftQuery {
  val name = "d9_contamination"
  val describe = "n-gram contamination: per probe doc, fraction of shingles found in the reference half"

  private[queries] val threshold = 0.5

  def run(spark: SparkSession, sfDir: String): DataFrame =
    // Shared stage output: d9's verdicts gate both p5 and p12, so an
    // enabled Materialize run scans the reference shingles once.
    graft.Materialize.table(spark, "d9_contamination", sfDir)(
      run(spark, sfDir, joinSalts = 1))

  /** `joinSalts > 1` routes the probe→reference shingle join through
    * [[graft.operators.Skew.saltedJoin]] — the mitigation for a hot shingle
    * key (a stopword 3-gram occurring in a large fraction of probe docs)
    * whose fan-in would otherwise pile onto one reducer at corpus scale.
    * Salting only respreads rows; the per-document aggregate is exact
    * integer arithmetic, so results are identical (pinned by
    * D9SaltedJoinSpec on a deliberately skewed fixture).
    */
  def run(spark: SparkSession, sfDir: String, joinSalts: Int): DataFrame = {
    require(joinSalts >= 1, s"joinSalts must be >= 1, got $joinSalts")
    val shs = graft.CacheScope.persisted(
      TextOps.shingleHashSets(Tables.documents(spark, sfDir)))
    val refShingles = shs.filter(col("doc_id") % 2 === 0)
      .select(explode(col("shs")).as("sh")).distinct()
      .withColumn("present", lit(1))
    // Every probe doc appears in the output — a document too short to have
    // shingles (< 3 tokens) is reported explicitly with n_shingles = 0 and
    // NULL score/flag ("unscorable at this granularity"), never silently
    // omitted: a consumer must be able to tell "scored clean" from "never
    // scored". (explode alone would drop those rows on both engines.)
    val probeDocs = shs.filter(col("doc_id") % 2 === 1).select(col("doc_id"))
    val probe = shs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), explode(col("shs")).as("sh"))
    val joined =
      if (joinSalts <= 1) probe.join(refShingles, Seq("sh"), "left")
      else graft.operators.Skew.saltedJoin(probe, refShingles, "sh", joinSalts, "left")
    val scored = joined
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("present"), lit(0))).as("n_overlap"))
    probeDocs.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        round(col("n_overlap").cast("double") / col("n_shingles"), 6).as("overlap_frac"),
        (col("n_overlap").cast("double") / col("n_shingles") >= threshold).as("contaminated"))
  }

  val oracle = Some(
    s"""WITH ${TextOps.shingleHashSetsSql(3)},
       |ref AS (
       |  SELECT DISTINCT unnest(shs) AS sh FROM shs WHERE doc_id % 2 = 0),
       |probe AS (
       |  SELECT doc_id, unnest(shs) AS sh FROM shs WHERE doc_id % 2 = 1),
       |ov AS (
       |  SELECT p.doc_id,
       |         count(*) AS n_shingles,
       |         CAST(sum(CASE WHEN r.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap
       |  FROM probe p LEFT JOIN ref r ON p.sh = r.sh
       |  GROUP BY p.doc_id)
       |SELECT d.doc_id,
       |       COALESCE(o.n_shingles, 0) AS n_shingles,
       |       COALESCE(o.n_overlap, 0) AS n_overlap,
       |       round(CAST(o.n_overlap AS DOUBLE) / o.n_shingles, 6) AS overlap_frac,
       |       (CAST(o.n_overlap AS DOUBLE) / o.n_shingles >= $threshold) AS contaminated
       |FROM (SELECT doc_id FROM shs WHERE doc_id % 2 = 1) d
       |LEFT JOIN ov o ON d.doc_id = o.doc_id""".stripMargin)
}
