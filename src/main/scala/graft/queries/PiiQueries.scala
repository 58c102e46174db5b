package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Shared machinery for the PII family (t20 scan + p8 redacted release):
  * the anonymization stage every production LLM-data pipeline runs before
  * release (the Dolma taggers / BigScience ROOTS PII pass / FineWeb
  * anonymization step) and the one text-pipeline operator class the t/p
  * surface lacked.
  *
  * The corpus is synthetic word salad with no digits or '@' anywhere, so —
  * exactly like m5's PPM payloads — the fixture injects deterministic
  * pseudo-PII derived from (doc_id, source, hash60) into each document, and
  * BOTH engines rebuild the same `pii_text` before scanning it with the same
  * regexes. The detection therefore runs against text whose true entity
  * counts are known by construction but are only reachable through the
  * regex path: a pattern-dialect divergence between Java regex (Spark) and
  * RE2 (DuckDB), a span boundary off by one, or a missed/spurious match all
  * flip the hash gate. Injection knobs give every branch mass: 0/1/2 emails
  * (h%3), phone present ~40% (h>>5 %5 < 2), IPv4 present ~43% (h>>7 %7 < 3),
  * and the insertion point splits the text mid-stream (h % len) so matches
  * never sit at fixed offsets.
  *
  * One definition, two surfaces (the k4 featureCols discipline): t20 and p8
  * both read [[piiTextCol]]/[[piiTextCte]] and the three pattern constants,
  * so scan and redaction structurally cannot disagree about what PII is.
  *
  * Pattern-dialect discipline: only the Java∩RE2 common subset — literal
  * classes, bounded repetition, `\d`, ASCII `\b`. No backreferences or
  * lookaround (RE2 has neither). On these patterns both engines produce
  * leftmost matches with identical extents, and the three patterns are
  * mutually non-overlapping on any text (emails need '@', phones need
  * hyphenated digit groups, IPs need dotted digit quads), so chained
  * replacement order cannot matter — [[PiiSpec]] pins all of this on a
  * hostile fixture.
  *
  * Scale: both queries are pure per-row projections over the documents scan
  * — no shuffle, no state, codegen-friendly string ops; at 100 TB this is
  * the embarrassingly-parallel map stage it should be (regex cost is the
  * knob, and these anchored-class patterns are linear-time in RE2 and
  * backtrack-free in Java's engine).
  */
object PiiOps {
  /** Java∩RE2 email shape: local part, '@', dotted domain ending in a TLD
    * of ≥2 letters. Scala-source escaping only — the pattern text reaching
    * both engines is identical.
    */
  val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  /** NANP-style hyphenated phone: 3-3-4 digit groups, word-bounded. */
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  /** Dotted IPv4 quad, word-bounded (the \b keeps a phone's digit runs and
    * an email's local part from ever seeding a partial quad).
    */
  val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The deterministic fixture text: documents.text with the injected
    * entity block spliced in at a hash-derived cut point. Column form; keep
    * in lockstep with [[piiTextCte]].
    */
  def piiTextCol(doc_id: Column, text: Column, source: Column): Column = {
    val h = Portable.hash60(concat(lit("pii:"), text))
    val nEm = h % 3
    val cut = h % greatest(length(text), lit(1))
    val email1 = concat(lit("user"), (doc_id % 1000).cast("string"),
      lit("@"), source, lit(".net"))
    val email2 = concat(lit("admin"), (doc_id % 97).cast("string"),
      lit("@mail-"), source, lit(".org"))
    val phone = concat(lit("555-"),
      lpad((h % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((shiftright(h, 10) % 10000).cast("string"), 4, "0"))
    val ip = concat(
      (shiftright(h, 16) % 256).cast("string"), lit("."),
      (shiftright(h, 24) % 256).cast("string"), lit("."),
      (shiftright(h, 32) % 256).cast("string"), lit("."),
      (shiftright(h, 40) % 256).cast("string"))
    val block = concat_ws(" ",
      when(nEm >= 1, email1),
      when(nEm === 2, email2),
      when(shiftright(h, 5) % 5 < 2, phone),
      when(shiftright(h, 7) % 7 < 3, ip))
    concat(text.substr(lit(1), cut.cast("int")), lit(" "), block, lit(" "),
      text.substr((cut + 1).cast("int"), length(text)))
  }

  /** DuckDB CTE chain ending in `${p}pii(doc_id, pii_text)` — the SQL
    * mirror of [[piiTextCol]] over source relation `src` (must expose
    * doc_id, text, source), same literals, same op order; CTE names
    * prefix-parameterized so the chain composes into larger oracles
    * without collisions (the s7→s11 / d18 discipline).
    */
  def piiTextCtes(src: String, p: String): String = {
    val h = Portable.hash60Sql("'pii:' || text")
    s"""${p}ph AS (
       |  SELECT doc_id, text, source, $h AS h FROM $src),
       |${p}pe AS (
       |  SELECT doc_id, text, source, h, h % 3 AS n_em,
       |         h % greatest(length(text), 1) AS cut
       |  FROM ${p}ph),
       |${p}pii AS (
       |  SELECT doc_id,
       |         substr(text, 1, CAST(cut AS INT)) || ' ' ||
       |         concat_ws(' ',
       |           CASE WHEN n_em >= 1 THEN 'user' || (doc_id % 1000) || '@' || source || '.net' END,
       |           CASE WHEN n_em = 2 THEN 'admin' || (doc_id % 97) || '@mail-' || source || '.org' END,
       |           CASE WHEN (h >> 5) % 5 < 2 THEN '555-' || lpad(CAST(h % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST((h >> 10) % 10000 AS VARCHAR), 4, '0') END,
       |           CASE WHEN (h >> 7) % 7 < 3 THEN ((h >> 16) % 256) || '.' || ((h >> 24) % 256) || '.' || ((h >> 32) % 256) || '.' || ((h >> 40) % 256) END) ||
       |         ' ' || substr(text, CAST(cut AS INT) + 1) AS pii_text
       |  FROM ${p}pe)""".stripMargin
  }

  /** The unprefixed chain over `documents` — t20/p8's original oracle form. */
  val piiTextCte: String = piiTextCtes("documents", "")

  /** Chained three-type redaction. Order is immaterial (disjoint patterns,
    * and no placeholder contains a digit or '@' that could seed a later
    * pattern) but is fixed email→phone→ip on both engines anyway.
    */
  def redactCol(piiText: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(piiText, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipRe, "[IP]")

  /** SQL mirror of [[redactCol]]. DuckDB regexp_replace is first-match-only
    * without the explicit 'g' flag (Spark is always global) — the
    * normalizedText lesson applied three times.
    */
  def redactSql(expr: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($expr, '$emailRe', '[EMAIL]', 'g'), '$phoneRe', '[PHONE]', 'g'), '$ipRe', '[IP]', 'g')"
}

/** t20: PII scan — per-document entity counts by type over the injected
  * fixture text (see [[PiiOps]]). `pii_chars` measures the total matched
  * extent as the SUM OF MATCH LENGTHS per type (round-10 change): the
  * previous delete-and-diff form could in principle overcount on
  * adversarial text, because deleting one match can juxtapose the
  * surrounding characters into a NEW match of a later pattern that the
  * original text never contained — the measurement itself synthesizing
  * extent. Summing `length` over each type's `regexp_extract_all` matches
  * measures exactly the spans present in the ORIGINAL text (the three
  * patterns are mutually non-overlapping, so the per-type sums cannot
  * double-count a character). The hash gate still pins match SPANS, not
  * just counts: engines agreeing a line holds one email but disagreeing
  * where it ends go red here even though the counts tie.
  */
object T20PiiScan extends GraftQuery {
  val name = "t20_pii_scan"
  val describe = "PII scan: per-doc email/phone/IPv4 counts + matched-extent chars (Dolma-tagger shape)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import PiiOps._
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        piiTextCol(col("doc_id"), col("text"), col("source")).as("pii_text"))
    def matchedChars(re: String): Column =
      aggregate(regexp_extract_all(col("pii_text"), lit(re), lit(0)),
        lit(0), (acc, m) => acc + length(m))
    d.select(
      col("doc_id"),
      size(regexp_extract_all(col("pii_text"), lit(emailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("pii_text"), lit(phoneRe), lit(0))).as("n_phones"),
      size(regexp_extract_all(col("pii_text"), lit(ipRe), lit(0))).as("n_ips"),
      (matchedChars(emailRe) + matchedChars(phoneRe) + matchedChars(ipRe)).as("pii_chars"))
      .withColumn("n_pii", (col("n_emails") + col("n_phones") + col("n_ips")).cast("int"))
  }

  val oracle = {
    import PiiOps._
    def matchedCharsSql(re: String): String =
      s"coalesce(list_sum(list_transform(regexp_extract_all(pii_text, '$re'), m -> length(m))), 0)"
    Some(
      s"""WITH ${piiTextCte}
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(pii_text, '$emailRe')) AS INT) AS n_emails,
         |       CAST(len(regexp_extract_all(pii_text, '$phoneRe')) AS INT) AS n_phones,
         |       CAST(len(regexp_extract_all(pii_text, '$ipRe')) AS INT) AS n_ips,
         |       CAST(${matchedCharsSql(emailRe)}
         |            + ${matchedCharsSql(phoneRe)}
         |            + ${matchedCharsSql(ipRe)} AS INT) AS pii_chars,
         |       CAST(len(regexp_extract_all(pii_text, '$emailRe'))
         |            + len(regexp_extract_all(pii_text, '$phoneRe'))
         |            + len(regexp_extract_all(pii_text, '$ipRe')) AS INT) AS n_pii
         |FROM pii""".stripMargin)
  }
}

/** p8: PII-redacted release — the disposition half: every document rewritten
  * with typed placeholders ([EMAIL]/[PHONE]/[IP]) substituted for each
  * match, surfaced as (redaction count, before/after lengths, md5 of the
  * full redacted text). The md5 makes the gate span-exact over the ENTIRE
  * rewritten corpus: any engine disagreement about any match boundary in
  * any document flips a hash. Counts tie to t20's n_pii by shared pattern
  * constants ([[PiiSpec]] pins the cross-query identity).
  */
object P8PiiRedacted extends GraftQuery {
  val name = "p8_pii_redacted"
  val describe = "PII-redacted corpus release: typed placeholders, md5-pinned rewritten text"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import PiiOps._
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        piiTextCol(col("doc_id"), col("text"), col("source")).as("pii_text"))
    val red = redactCol(col("pii_text"))
    d.select(
      col("doc_id"),
      (size(regexp_extract_all(col("pii_text"), lit(emailRe), lit(0)))
        + size(regexp_extract_all(col("pii_text"), lit(phoneRe), lit(0)))
        + size(regexp_extract_all(col("pii_text"), lit(ipRe), lit(0)))).cast("int").as("n_redactions"),
      length(col("pii_text")).as("len_raw"),
      length(red).as("len_redacted"),
      md5(red.cast("binary")).as("redacted_md5"))
  }

  val oracle = {
    import PiiOps._
    Some(
      s"""WITH ${piiTextCte}
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(pii_text, '$emailRe'))
         |            + len(regexp_extract_all(pii_text, '$phoneRe'))
         |            + len(regexp_extract_all(pii_text, '$ipRe')) AS INT) AS n_redactions,
         |       CAST(length(pii_text) AS INT) AS len_raw,
         |       CAST(length(${redactSql("pii_text")}) AS INT) AS len_redacted,
         |       md5(${redactSql("pii_text")}) AS redacted_md5
         |FROM pii""".stripMargin)
  }
}
