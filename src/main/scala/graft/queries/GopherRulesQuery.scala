package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** t22: Gopher-style document quality RULES — the hand-written heuristic
  * gate battery every production corpus runs alongside a learned classifier
  * (Rae et al. 2021 "Scaling Language Models: ... Gopher", Appendix A1.1;
  * the same rule family Dolma and FineWeb ship): line-structure statistics
  * (bullet-line fraction, ellipsis-line fraction, duplicate-line fraction)
  * plus mean word length, each compared against the published thresholds,
  * composed into one keep/drop verdict. t2/k4 are the LEARNED quality
  * scores; t22 is the RULE gate — production stacks run both.
  *
  * The corpus is single-line word salad, so — the t21 markup discipline —
  * both engines deterministically build the same multi-line fixture first:
  * the text split into three lines at len/3 boundaries, with hash-gated
  * structural injections (a leading "- " bullet line, a trailing "..."
  * line, and two duplicated copies of the first line). The injections give
  * every rule real mass AND make the composite verdict cut both ways:
  * the duplicate-line branch pushes dup_line_frac to 2/n, which crosses
  * the 0.30 threshold exactly when few other lines were injected — so
  * keep/drop flips on the branch combination, not on a vacuous constant.
  *
  * Engine-exactness: every fraction is one division of exact integers
  * rounded to 6 (the t2 threshold discipline: gates compare ROUNDED
  * values, so a ulp cannot flip a verdict); line splits use integer
  * `len/3` truncation on both engines (Spark double-div cast truncates =
  * DuckDB `//` — the t21 halving lesson).
  *
  * Scale: pure per-row projection over the scan — no shuffle, no state;
  * the line/word arrays are doc-bounded.
  */
object T22GopherRules extends GraftQuery {
  val name = "t22_gopher_rules"
  val describe = "Gopher rule gates: bullet/ellipsis/dup-line fractions + word stats -> keep verdict"

  // Gopher A1.1 thresholds (public paper)
  private val maxBulletFrac = 0.90
  private val maxEllipsisFrac = 0.30
  private val maxDupLineFrac = 0.30
  private val minMeanWordLen = 3.0
  private val maxMeanWordLen = 10.0

  /** The injected multi-line fixture document. Column form; SQL mirror in
    * [[fixtureCte]].
    */
  private def fixtureCol(text: Column): Column = {
    val h = Portable.hash60(concat(lit("gq:"), text))
    val third = (length(text) / 3).cast("int")
    val l1 = text.substr(lit(1), third)
    val l2 = text.substr(third + 1, third)
    val l3 = text.substr(third * 2 + 1, length(text))
    concat(
      when(h % 3 === 0, concat(lit("- bullet item "), (h % 50).cast("string"), lit("\n")))
        .otherwise(lit("")),
      l1, lit("\n"), l2, lit("\n"), l3,
      when(h % 4 === 0, lit("\ntrailing thought...")).otherwise(lit("")),
      when(h % 5 === 0, concat(lit("\n"), l1, lit("\n"), l1)).otherwise(lit("")))
  }

  private val fixtureCte: String = {
    val h = Portable.hash60Sql("'gq:' || text")
    s"""gh AS (SELECT doc_id, text, $h AS h,
       |             CAST(length(text) // 3 AS INT) AS third FROM documents),
       |gfx AS (
       |  SELECT doc_id,
       |         CASE WHEN h % 3 = 0 THEN '- bullet item ' || (h % 50) || chr(10) ELSE '' END ||
       |         substr(text, 1, third) || chr(10) ||
       |         substr(text, third + 1, third) || chr(10) ||
       |         substr(text, 2 * third + 1) ||
       |         CASE WHEN h % 4 = 0 THEN chr(10) || 'trailing thought...' ELSE '' END ||
       |         CASE WHEN h % 5 = 0
       |              THEN chr(10) || substr(text, 1, third) || chr(10) || substr(text, 1, third)
       |              ELSE '' END AS doc
       |  FROM gh)""".stripMargin
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), fixtureCol(col("text")).as("doc"))
    val lines = split(col("doc"), "\n")
    val words = filter(split(col("doc"), "[ \n]+"), w => w =!= "")
    val nLines = size(lines)
    val nBullet = size(filter(lines, l => l.startsWith("- ")))
    val nEllipsis = size(filter(lines, l => l.endsWith("...")))
    val nDistinct = size(array_distinct(lines))
    val wordLenSum = aggregate(words, lit(0), (acc, w) => acc + length(w))
    d.select(col("doc_id"), nLines.as("nl"), nBullet.as("nb"), nEllipsis.as("ne"),
      nDistinct.as("nd"), size(words).as("nw"), wordLenSum.as("wls"))
      .select(
        col("doc_id"),
        col("nl").as("n_lines"),
        col("nw").as("n_words"),
        round(col("nb").cast("double") / col("nl"), 6).as("bullet_frac"),
        round(col("ne").cast("double") / col("nl"), 6).as("ellipsis_frac"),
        round((col("nl") - col("nd")).cast("double") / col("nl"), 6).as("dup_line_frac"),
        round(col("wls").cast("double") / col("nw"), 6).as("mean_word_len"))
      .withColumn("keep",
        col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("dup_line_frac") <= maxDupLineFrac &&
          col("mean_word_len") >= minMeanWordLen &&
          col("mean_word_len") <= maxMeanWordLen)
  }

  val oracle = Some(
    s"""WITH $fixtureCte,
       |gl AS (
       |  SELECT doc_id,
       |         string_split(doc, chr(10)) AS lines,
       |         list_filter(string_split_regex(doc, '[ \\n]+'), w -> w <> '') AS words
       |  FROM gfx),
       |gm AS (
       |  SELECT doc_id,
       |         len(lines) AS nl,
       |         len(list_filter(lines, l -> l LIKE '- %')) AS nb,
       |         len(list_filter(lines, l -> l LIKE '%...')) AS ne,
       |         len(list_distinct(lines)) AS nd,
       |         len(words) AS nw,
       |         CAST(coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS BIGINT) AS wls
       |  FROM gl)
       |SELECT doc_id,
       |       CAST(nl AS INT) AS n_lines,
       |       CAST(nw AS INT) AS n_words,
       |       round(CAST(nb AS DOUBLE) / nl, 6) AS bullet_frac,
       |       round(CAST(ne AS DOUBLE) / nl, 6) AS ellipsis_frac,
       |       round(CAST(nl - nd AS DOUBLE) / nl, 6) AS dup_line_frac,
       |       round(CAST(wls AS DOUBLE) / nw, 6) AS mean_word_len,
       |       (round(CAST(nb AS DOUBLE) / nl, 6) <= $maxBulletFrac
       |        AND round(CAST(ne AS DOUBLE) / nl, 6) <= $maxEllipsisFrac
       |        AND round(CAST(nl - nd AS DOUBLE) / nl, 6) <= $maxDupLineFrac
       |        AND round(CAST(wls AS DOUBLE) / nw, 6) >= $minMeanWordLen
       |        AND round(CAST(wls AS DOUBLE) / nw, 6) <= $maxMeanWordLen) AS keep
       |FROM gm""".stripMargin)
}
