package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** p9: the COMPLETE release manifest — p4's assembly extended with the
  * round-9 sub-document editors, i.e. the full modern pipeline as ONE
  * declared query under one hash gate:
  *
  *   1. clean   — p1's dispositions; only `kept` documents continue;
  *   2. strip   — p7's exact-substring span removal, run WITHIN the kept
  *      corpus (the release dedups what it ships, not the raw crawl: a
  *      span duplicated only against dropped docs is not boilerplate);
  *   3. redact  — p8's PII replacement chain over the stripped text (on
  *      this corpus an identity pass — the raw text holds no PII; its
  *      differentiating power is pinned separately by t20/p8's injected
  *      fixture — composed here so the released bytes go through every
  *      editor in deployment order);
  *   4. mix     — p3's per-source quotas over the kept set;
  *   5. pack    — p2's distributed prefix-sum packing over the POST-STRIP
  *      token counts (the material difference vs p4: chunk boundaries
  *      reflect what will actually be fed to the tokenizer, and a doc
  *      stripped to zero tokens leaves the manifest entirely).
  *
  * Output: one manifest row per packed document — raw/dropped/clean token
  * counts, chunk spans, and `release_md5` = md5 of the final
  * stripped-and-redacted text, so the gate pins the released BYTES, not
  * just their bookkeeping.
  *
  * Scale shape: p1/p7/p3/p2's own (each stage narrows the next; the d18
  * gram chain runs over survivors only); the only additions are one
  * doc_id-keyed join per stage boundary. Oracle: p1's disposition CTEs +
  * the prefix-parameterized strip chain over `ksrc` + p3/p2's replay over
  * the CLEANED counts — every piece is its stage's own oracle SQL.
  */
object P9ReleaseManifest extends GraftQuery {
  val name = "p9_release_manifest"
  val describe = "full release: p1 clean -> p7 strip -> p8 redact -> p3 mixture -> p2 packing, md5-pinned bytes"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val kept = P1CleanCorpus.runOn(spark, docs)
      .filter(col("status") === "kept").select(col("doc_id"))
    val ksrc = graft.CacheScope.persisted(
      docs.join(kept, "doc_id").select(col("doc_id"), col("source"), col("text")))
    val clean = graft.CacheScope.persisted(
      P7SpanStrip.stripOn(ksrc.select(col("doc_id"), col("text"))))
    val samp = P3MixtureSample.sample(ksrc.select(col("doc_id"), col("source")))
      .select(col("doc_id"), col("source"))
    val packed = P2SequencePack.pack(spark,
      samp.join(clean, "doc_id")
        .select(col("doc_id"), (col("n_tokens") - col("n_dropped")).as("n_tokens")),
      spark.sparkContext.defaultParallelism)
    packed.join(samp, "doc_id")
      .join(clean.select(col("doc_id"),
        col("n_tokens").as("n_raw_tokens"), col("n_dropped"),
        md5(PiiOps.redactCol(col("clean_text")).cast("binary")).as("release_md5")),
        "doc_id")
      .select(col("doc_id"), col("source"),
        col("n_raw_tokens"), col("n_dropped"), col("n_tokens"),
        col("start_chunk"), col("end_chunk"), col("start_offset"),
        col("release_md5"))
  }

  val oracle = Some(
    s"""WITH RECURSIVE ${P1CleanCorpus.dispositionCtesSql},
       |kept AS (
       |  SELECT a.doc_id FROM alive a LEFT JOIN comp c ON a.doc_id = c.node
       |  WHERE c.component IS NULL OR c.component = a.doc_id),
       |ksrc AS (
       |  SELECT d.doc_id, d.source, d.text
       |  FROM documents d JOIN kept k ON d.doc_id = k.doc_id),
       |${P7SpanStrip.stripSqlCtes("ksrc", "x")},
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
       |         (c.n_tokens - c.n_dropped) AS n_tokens,
       |         ${P2SequencePack.orderHashSql} AS h
       |  FROM samp s JOIN xclean c USING (doc_id)),
       |pcum AS (
       |  SELECT doc_id, source, n_tokens,
       |         CAST(sum(n_tokens) OVER (
       |           ORDER BY h ASC, doc_id ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_end
       |  FROM ptok WHERE n_tokens > 0)
       |SELECT p.doc_id, p.source,
       |       c.n_tokens AS n_raw_tokens, c.n_dropped, p.n_tokens,
       |       (p.cum_end - p.n_tokens) // ${P2SequencePack.seqLen} AS start_chunk,
       |       (p.cum_end - 1) // ${P2SequencePack.seqLen} AS end_chunk,
       |       (p.cum_end - p.n_tokens) % ${P2SequencePack.seqLen} AS start_offset,
       |       md5(${PiiOps.redactSql("c.clean_text")}) AS release_md5
       |FROM pcum p JOIN xclean c USING (doc_id)""".stripMargin)
}
