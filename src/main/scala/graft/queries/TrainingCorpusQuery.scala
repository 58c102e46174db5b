package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** p4: the full training-corpus ASSEMBLY, end-to-end under one hash gate —
  * p1's cleaning dispositions feeding p3's mixture sampling feeding p2's
  * sequence packing, composed through their library forms exactly as a
  * deployment would chain them:
  *
  *   1. clean   — p1 (quality gate → exact dedup → LSH near-dup collapse);
  *                only `kept` docs continue;
  *   2. mix     — p3's weighted per-source quotas over the KEPT set (the
  *                budget and quotas derive from what survived cleaning, not
  *                the raw corpus — mixing before cleaning over-samples
  *                sources with high duplicate/low-quality rates);
  *   3. pack    — p2's deterministic-order token prefix-sum over the mixed
  *                sample, cut into seqLen-token training chunks.
  *
  * Output: one row per packed document — (doc_id, source, n_tokens,
  * start_chunk, end_chunk, start_offset): the manifest a packed-dataset
  * writer emits. p1/p2/p3 each prove their stage alone; p4 proves the
  * COMPOSITION (stage boundaries, survivor plumbing, quota bases) — the
  * part an end-to-end user actually runs and the part unit stages can't
  * cover.
  *
  * Scale shape: inherited from the stages — each narrows the next's input
  * (cleaning first, so shingling/mixing/packing never touch dropped docs);
  * the only driver-side data across the whole chain is p2's O(P) per-range
  * token totals and the component loop's convergence scalar. No new
  * shuffle beyond the stages' own.
  */
object P4TrainingCorpus extends GraftQuery {
  val name = "p4_training_corpus"
  val describe = "end-to-end assembly: p1 clean -> p3 mixture over kept -> p2 packing, one manifest"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val kept = P1CleanCorpus.dispositions(spark, sfDir)
      .filter(col("status") === "kept").select(col("doc_id"))
    val ksrc = graft.CacheScope.persisted(
      docs.join(kept, "doc_id").select(col("doc_id"), col("source"), col("text")))
    val samp = P3MixtureSample.sample(ksrc.select(col("doc_id"), col("source")))
      .select(col("doc_id"), col("source"))
    val packed = P2SequencePack.pack(spark,
      samp.join(ksrc.drop("source"), "doc_id")
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
      spark.sparkContext.defaultParallelism)
    packed.join(samp, "doc_id")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_chunk"), col("end_chunk"), col("start_offset"))
  }

  /** p1's disposition CTEs + the mixture and packing stages replayed over
    * the kept set (p3/p2's own oracle shapes with the corpus swapped for
    * `ksrc`). DuckDB's single global cumsum window stands in for p2's
    * distributed range-partitioned prefix sum — different construction,
    * same total order.
    */
  val oracle = Some(
    s"""WITH RECURSIVE ${P1CleanCorpus.dispositionCtesSql},
       |kept AS (
       |  SELECT a.doc_id FROM alive a LEFT JOIN comp c ON a.doc_id = c.node
       |  WHERE c.component IS NULL OR c.component = a.doc_id),
       |ksrc AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d JOIN kept k ON d.doc_id = k.doc_id),
       |mw AS (
       |  SELECT DISTINCT source,
       |         CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w
       |  FROM ksrc),
       |mtw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM mw),
       |mn AS (SELECT count(*) AS n FROM ksrc),
       |mrk AS (
       |  SELECT source, doc_id,
       |         CAST(row_number() OVER (
       |           PARTITION BY source
       |           ORDER BY ${P3MixtureSample.sampleHashSql} ASC, doc_id ASC) AS BIGINT) AS rk
       |  FROM ksrc),
       |samp AS (
       |  SELECT r.doc_id, r.source
       |  FROM mrk r JOIN mw USING (source) CROSS JOIN mn CROSS JOIN mtw
       |  WHERE r.rk <= (mn.n // ${P3MixtureSample.budgetDiv}) * mw.w // mtw.tw),
       |ptok AS (
       |  SELECT s.doc_id, s.source,
       |         CAST(len(${TextOps.tokensSql("k.text")}) AS BIGINT) AS n_tokens,
       |         ${P2SequencePack.orderHashSql} AS h
       |  FROM samp s JOIN ksrc k USING (doc_id)),
       |pcum AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (
       |           ORDER BY h ASC, doc_id ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
       |  FROM ptok WHERE n_tokens > 0)
       |SELECT doc_id, source, n_tokens,
       |       (cum_end - n_tokens) // ${P2SequencePack.seqLen} AS start_chunk,
       |       (cum_end - 1) // ${P2SequencePack.seqLen} AS end_chunk,
       |       (cum_end - n_tokens) % ${P2SequencePack.seqLen} AS start_offset
       |FROM pcum""".stripMargin)
}
