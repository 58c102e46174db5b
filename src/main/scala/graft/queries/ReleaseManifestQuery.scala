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
  *      differentiating power WITHIN the composition is pinned by p10,
  *      which runs this same chain over PII-injected text — composed here
  *      so the released bytes go through every editor in deployment order);
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

  /** p9/p10's shared upstream: the kept source (a cheap doc_id join over
    * the shared p1 dispositions) and the post-strip clean frame — the
    * expensive d18 gram chain over the kept corpus — the latter a
    * [[graft.Materialize]] stage output so the two releases strip once.
    */
  private[queries] def keptSrc(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val kept = P1CleanCorpus.dispositions(spark, sfDir)
      .filter(col("status") === "kept").select(col("doc_id"))
    docs.join(kept, "doc_id").select(col("doc_id"), col("source"), col("text"))
  }

  private[queries] def keptClean(spark: SparkSession, sfDir: String): DataFrame =
    graft.Materialize.table(spark, "p9_kept_clean", sfDir)(
      P7SpanStrip.stripOn(keptSrc(spark, sfDir).select(col("doc_id"), col("text"))))

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val ksrc = graft.CacheScope.persisted(keptSrc(spark, sfDir))
    val clean = graft.CacheScope.persisted(keptClean(spark, sfDir))
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

/** p10: the PII-DIFFERENTIATED complete release — p9's exact chain
  * (clean → strip → redact → mix → pack) with the redact stage operating on
  * text that actually CONTAINS PII: the post-strip `clean_text` with
  * [[PiiOps]]' deterministic entity injection spliced in (the t20/p8
  * fixture device, applied INSIDE the composition). p9's redact stage is an
  * identity pass on this corpus, so a wiring mistake within p9's
  * composition — redacting the wrong column, dropping the stage — could not
  * flip p9's hash; here every composed stage has differentiating mass under
  * ONE gate: the manifest carries `n_redactions` (nonzero for ~all packed
  * docs by the injection knobs) and `release_md5` = md5 of the
  * redact(inject(strip(clean_text))) bytes, so a dropped or misordered
  * editor, a span boundary error, or a packing mistake each flip the hash.
  *
  * Injection sits AFTER strip deliberately: the injected entities must not
  * perturb p1's dedup hashes or p7's duplicated-gram detection (their
  * oracles run on the raw corpus), so the chain upstream of the redact
  * boundary is byte-identical to p9's — p10 pins the COMPOSITION of the
  * redact stage, p8 pins its standalone semantics, and the token counts
  * keep p9's definition (the injected block is a gate fixture, not corpus
  * content).
  *
  * Scale shape: p9's plus one more shuffle-free projection (inject+redact
  * are per-row string ops riding the existing manifest join).
  */
object P10ReleasePii extends GraftQuery {
  val name = "p10_release_pii"
  val describe = "PII-differentiated release: p9's chain with redaction mass inside the composition"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import PiiOps._
    val ksrc = graft.CacheScope.persisted(P9ReleaseManifest.keptSrc(spark, sfDir))
    val clean = graft.CacheScope.persisted(P9ReleaseManifest.keptClean(spark, sfDir))
    val samp = P3MixtureSample.sample(ksrc.select(col("doc_id"), col("source")))
      .select(col("doc_id"), col("source"))
    val packed = P2SequencePack.pack(spark,
      samp.join(clean, "doc_id")
        .select(col("doc_id"), (col("n_tokens") - col("n_dropped")).as("n_tokens")),
      spark.sparkContext.defaultParallelism)
    val pii = piiTextCol(col("doc_id"), col("clean_text"), col("source"))
    val red = redactCol(pii)
    packed.join(samp, "doc_id")
      .join(clean.select(col("doc_id"), col("clean_text"),
        col("n_tokens").as("n_raw_tokens"), col("n_dropped")), "doc_id")
      .select(col("doc_id"), col("source"),
        col("n_raw_tokens"), col("n_dropped"), col("n_tokens"),
        col("start_chunk"), col("end_chunk"), col("start_offset"),
        (size(regexp_extract_all(pii, lit(emailRe), lit(0)))
          + size(regexp_extract_all(pii, lit(phoneRe), lit(0)))
          + size(regexp_extract_all(pii, lit(ipRe), lit(0)))).cast("int").as("n_redactions"),
        md5(red.cast("binary")).as("release_md5"))
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
       |  FROM ptok WHERE n_tokens > 0),
       |vsrc AS (
       |  SELECT c.doc_id, c.clean_text AS text, k.source
       |  FROM xclean c JOIN ksrc k USING (doc_id)),
       |${PiiOps.piiTextCtes("vsrc", "v")}
       |SELECT p.doc_id, p.source,
       |       c.n_tokens AS n_raw_tokens, c.n_dropped, p.n_tokens,
       |       (p.cum_end - p.n_tokens) // ${P2SequencePack.seqLen} AS start_chunk,
       |       (p.cum_end - 1) // ${P2SequencePack.seqLen} AS end_chunk,
       |       (p.cum_end - p.n_tokens) % ${P2SequencePack.seqLen} AS start_offset,
       |       CAST(len(regexp_extract_all(i.pii_text, '${PiiOps.emailRe}'))
       |            + len(regexp_extract_all(i.pii_text, '${PiiOps.phoneRe}'))
       |            + len(regexp_extract_all(i.pii_text, '${PiiOps.ipRe}')) AS INT) AS n_redactions,
       |       md5(${PiiOps.redactSql("i.pii_text")}) AS release_md5
       |FROM pcum p JOIN xclean c USING (doc_id) JOIN vpii i USING (doc_id)""".stripMargin)
}
