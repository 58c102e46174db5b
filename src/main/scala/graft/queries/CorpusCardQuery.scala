package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** t17: the per-source CORPUS CARD — the datasheet table a training-data
  * release publishes per source (docs, token mass, quality profile, dominant
  * detected language, low-quality share). Composes the library's own
  * signals (t3's token count, t2's quality, t1's detector) into the
  * reporting view an operator actually reads; every constituent is already
  * oracle-verified on its own surface.
  *
  * Shape: ONE scan projects (source, n_tok, quality, pred_lang) — all
  * per-row, codegen'd — then two source-keyed aggregates: the stats rollup
  * and the (source, lang) counts whose per-source argmax is a struct-MIN
  * over (−count, lang) (max count, then alphabetically-first language —
  * the string-keyed variant of s4's windowless argmax). Both shuffles are
  * keyed on source (bounded cardinality), map-side combined; the argmax
  * result broadcasts back onto the stats row.
  *
  * Determinism: the quality mean is Rounding.exactAvg — per-row scores are
  * on the 1e-6 grid, so the t9 "reorder noise ≪ grid" argument fails
  * exactly at grid midpoints (a mean of grid values over n rows is an exact
  * multiple of 1e-6/n, so midpoints are LIKELY, and round-6 flipped on
  * summation order in round 6); the scaled-long sum is order-independent
  * and bit-equal across engines. The low-quality count compares the ROUNDED
  * score against p1's threshold (the gate discipline); language and count
  * ties are totally ordered.
  */
object T17CorpusCard extends GraftQuery {
  val name = "t17_corpus_card"
  val describe = "per-source datasheet: docs, tokens, avg/low quality, dominant detected language"

  private val lowQualityCut = P1CleanCorpus.qualityThreshold

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val q = round(T2Quality.score(col("text")), 6)
    val base = Tables.documents(spark, sfDir).select(
      col("source"),
      size(toks).cast("long").as("n_tok"),
      q.as("quality"),
      T1LangId.predLang(array_distinct(toks)).as("pred_lang"))
    val stats = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).as("n_tokens"),
      graft.functions.Rounding.exactAvg(col("quality"), 6).as("avg_quality"),
      sum(when(col("quality") < lowQualityCut, 1L).otherwise(0L)).as("n_lowq"))
    val topLang = base.groupBy(col("source"), col("pred_lang"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(min(struct((-col("c")).as("nc"), col("pred_lang").as("l"))).as("m"))
      .select(col("source"), col("m.l").as("top_lang"), (-col("m.nc")).as("top_lang_n"))
    stats.join(broadcast(topLang), Seq("source"))
  }

  val oracle = Some(
    s"""WITH t AS (
       |  SELECT doc_id, source, ${TextOps.tokensSql("text")} AS toks FROM documents),
       |${T2Quality.scoreSqlCte("documents", "qsc")},
       |base AS (
       |  SELECT t.source, len(t.toks) AS n_tok, round(q.quality, 6) AS quality,
       |         ${T1LangId.predLangSql.replace("toks", "list_distinct(t.toks)")} AS pred_lang
       |  FROM t JOIN qsc q ON t.doc_id = q.doc_id),
       |stats AS (
       |  SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |         ${graft.functions.Rounding.exactAvgSql("quality", 6)} AS avg_quality,
       |         CAST(sum(CASE WHEN quality < $lowQualityCut THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq
       |  FROM base GROUP BY source),
       |lc AS (SELECT source, pred_lang, count(*) AS c FROM base GROUP BY 1, 2),
       |top AS (
       |  SELECT source, pred_lang AS top_lang, c AS top_lang_n,
       |         row_number() OVER (PARTITION BY source ORDER BY c DESC, pred_lang ASC) AS rk
       |  FROM lc)
       |SELECT s.source, s.n_docs, s.n_tokens, s.avg_quality, s.n_lowq,
       |       t.top_lang, t.top_lang_n
       |FROM stats s JOIN top t ON s.source = t.source AND t.rk = 1""".stripMargin)
}
