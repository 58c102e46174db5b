package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** p5: DECONTAMINATED release dispositions — p1's cleaning pipeline composed
  * with d9's eval-overlap gate, the release rule every LLM data org enforces
  * before a training corpus ships: a document may be high-quality and
  * dedup-canonical and still be unshippable because it carries held-out
  * benchmark content. Following d9's convention (even doc_ids stand in for
  * the benchmark suite, odd doc_ids are scored against it), a p1-`kept`
  * document whose shingle overlap with the benchmark half is ≥ 50% is
  * re-dispositioned `eval_overlap` with no survivor — dropped outright, not
  * replaced, because unlike a duplicate it has no clean stand-in.
  *
  * Output: p1's per-document audit schema plus the overlap evidence
  * (`eval_overlap_frac`, NULL for unscored documents) — the provenance
  * table a release review reads.
  *
  * Scale shape: both inputs are the library's own queries (p4's composition
  * discipline); the join that merges them is keyed on doc_id — one
  * hash-partitioned shuffle of two already-reduced per-doc frames. The
  * shingle work is shared in kind (both sides derive from the same
  * shingle-hash frame shape); a deployment materializing the pipeline once
  * would literally share the scan.
  *
  * Oracle: p1's recursive disposition CTE chain already defines the `shs`
  * shingle-set CTE d9's contamination math needs, so the oracle composes
  * both computations over ONE shared shingle derivation — the SQL mirror of
  * the shared-scan argument.
  */
object P5Decontaminated extends GraftQuery {
  val name = "p5_decontaminated"
  val describe = "release gate: p1 dispositions re-checked against d9 eval overlap (kept+contaminated -> eval_overlap)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val disp = P1CleanCorpus.run(spark, sfDir)
    val cont = D9Contamination.run(spark, sfDir)
      .select(col("doc_id"), col("overlap_frac"), col("contaminated"))
    val hit = col("status") === "kept" && coalesce(col("contaminated"), lit(false))
    disp.join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality"),
        when(hit, lit("eval_overlap")).otherwise(col("status")).as("status"),
        when(hit, lit(null).cast("long")).otherwise(col("survivor")).as("survivor"),
        col("overlap_frac").as("eval_overlap_frac"))
  }

  /** d9's contamination verdict as a reusable CTE block (requires `shs`
    * from the disposition chain's pair CTEs): evens are the eval reference
    * set, odds are probed, `contam(doc_id, overlap_frac, contaminated)`.
    * Shared with p12's funnel so the two gates cannot drift.
    */
  private[queries] val contamCtesSql: String =
    s"""cref AS (SELECT DISTINCT unnest(shs) AS sh FROM shs WHERE doc_id % 2 = 0),
       |cprobe AS (SELECT doc_id, unnest(shs) AS sh FROM shs WHERE doc_id % 2 = 1),
       |cov AS (
       |  SELECT p.doc_id, count(*) AS n_shingles,
       |         CAST(sum(CASE WHEN r.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap
       |  FROM cprobe p LEFT JOIN cref r ON p.sh = r.sh
       |  GROUP BY p.doc_id),
       |contam AS (
       |  SELECT doc_id,
       |         round(CAST(n_overlap AS DOUBLE) / n_shingles, 6) AS overlap_frac,
       |         (CAST(n_overlap AS DOUBLE) / n_shingles >= ${D9Contamination.threshold}) AS contaminated
       |  FROM cov)""".stripMargin

  val oracle = Some(
    s"""WITH RECURSIVE ${P1CleanCorpus.dispositionCtesSql},
       |p1d AS (
       |  SELECT doc_id, round(quality, 6) AS quality, 'low_quality' AS status,
       |         CAST(NULL AS BIGINT) AS survivor
       |  FROM qsc WHERE round(quality, 6) < ${P1CleanCorpus.qualityThreshold}
       |  UNION ALL
       |  SELECT doc_id, quality, 'exact_dup' AS status, surv_id AS survivor
       |  FROM ex WHERE doc_id <> surv_id
       |  UNION ALL
       |  SELECT a.doc_id, a.quality,
       |         CASE WHEN c.component IS NOT NULL AND c.component <> a.doc_id
       |              THEN 'near_dup' ELSE 'kept' END AS status,
       |         CASE WHEN c.component IS NOT NULL AND c.component <> a.doc_id
       |              THEN c.component ELSE a.doc_id END AS survivor
       |  FROM alive a LEFT JOIN comp c ON a.doc_id = c.node),
       |$contamCtesSql
       |SELECT p.doc_id, p.quality,
       |       CASE WHEN p.status = 'kept' AND COALESCE(c.contaminated, false)
       |            THEN 'eval_overlap' ELSE p.status END AS status,
       |       CASE WHEN p.status = 'kept' AND COALESCE(c.contaminated, false)
       |            THEN CAST(NULL AS BIGINT) ELSE p.survivor END AS survivor,
       |       c.overlap_frac AS eval_overlap_frac
       |FROM p1d p LEFT JOIN contam c ON p.doc_id = c.doc_id""".stripMargin)
}
