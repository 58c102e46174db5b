package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Rank, TextOps}

/** t19: REFERENCE-trained LM quality filter — the CCNet shape (Wenzek et
  * al. 2020): train a language model on a trusted reference corpus, score
  * every document by average log-probability under it, and split the corpus
  * into head/middle/tail terciles by that score; tail docs are the usual
  * drop/down-weight candidates. This differs from t9 exactly where CCNet
  * differs from self-scoring: t9's LM is trained on the corpus being scored
  * (unusual-for-THIS-corpus text scores low), t19's is trained on a pinned
  * reference subset (unusual-for-the-REFERENCE text scores low), so
  * documents from outside the reference distribution — wrong register,
  * wrong language, gibberish — sink even when internally self-consistent.
  *
  * Shape at scale: training is t9's two grouped counts restricted to the
  * reference slice (output bounded by reference vocabulary); scoring joins
  * every document's bigram occurrences against the count tables on the
  * n-gram key — LEFT joins, because out-of-vocabulary bigrams are the
  * signal here, scored at the add-1 floor ln(1/(cw+V)). The tercile split
  * needs a GLOBAL rank over per-doc scores: `Rank.globalRowNumber` (the q6
  * construction as a library form) — range partition + per-range window +
  * O(P) metadata offsets, never a single-partition sort.
  *
  * Determinism: avg_logp is `Rounding.exactAvg(_, 12, 4)` (t9's treatment —
  * summation order removed by the quantized scaled-long fold, cross-engine
  * ln ulps absorbed by the 4-decimal grid); oov_frac is a ratio of
  * identical integers; the rank orders by the exact grid double with doc_id
  * tiebreak, and tercile boundaries are integer comparisons rk*3 <= n /
  * rk*3 <= 2n.
  */
object T19LmFilter extends GraftQuery {
  val name = "t19_lm_filter"
  val describe = "CCNet-style filter: reference-trained bigram LM score + head/middle/tail terciles"

  /** The trusted reference slice (CCNet's Wikipedia stand-in). */
  private[queries] val refSources = Seq("src0", "src1", "src2", "src3", "src4")
  private def refSqlList = refSources.map(s => s"'$s'").mkString(", ")

  def run(spark: SparkSession, sfDir: String): DataFrame =
    // Shared stage output: t26's disagreement audit reads the same scored
    // buckets this query publishes, so an enabled Materialize run trains
    // and ranks once (k4's k4_scored treatment applied to the LM filter).
    graft.Materialize.table(spark, "t19_buckets", sfDir)(build(spark, sfDir))

  private def build(spark: SparkSession, sfDir: String): DataFrame = {
    val docToks = graft.CacheScope.persisted(Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), TextOps.tokens(col("text")).as("toks")))
    val m = size(col("toks")) - 1
    // Bigram OCCURRENCES of every document (the scoring stream)…
    val occ = docToks
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(arrays_zip(slice(col("toks"), lit(1), m), slice(col("toks"), lit(2), m))).as("p"))
      .select(col("doc_id"), col("p.0").as("w1"), col("p.1").as("w2"))
    // …and the model: counts over the REFERENCE slice only.
    val ref = docToks.filter(col("source").isin(refSources: _*))
    val bigramCounts = occ.join(ref.select(col("doc_id")), "doc_id")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val uniCounts = ref
      .select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val vocab = uniCounts.agg(count(lit(1)).as("v"))
    val cb0 = coalesce(col("cb"), lit(0L))
    val cw0 = coalesce(col("cw"), lit(0L))
    val scored = occ
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(uniCounts, occ("w1") === uniCounts("w"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(when(cb0 === 0, 1L).otherwise(0L)).cast("double") / count(lit(1)), 6)
          .as("oov_frac"),
        graft.functions.Rounding.exactAvg(
          log((cb0 + 1.0) / (cw0 + col("v"))), 12, 4).as("avg_logp"))
    val n = scored.agg(count(lit(1)).as("n"))
    Rank.globalRowNumber(scored,
        Seq(col("avg_logp").desc, col("doc_id").asc),
        spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_bigrams"), col("oov_frac"), col("avg_logp"),
        when(col("rk") * 3 <= col("n"), "head")
          .when(col("rk") * 3 <= col("n") * 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** The full filter chain as CTEs ending in
    * `<out>(doc_id, n_bigrams, oov_frac, avg_logp, bucket)` — t19's own
    * oracle body with every CTE name carrying prefix `p`, so a composed
    * consumer (t26's disagreement audit) can sit it beside k4/k5's chains
    * without name collisions (k5's thresholds CTE is also `th` — exactly
    * the memory'd CTE-collision hazard the prefix removes).
    */
  private[queries] def filterCtesSql(p: String, out: String): String =
    s"""${p}th AS (SELECT doc_id, source, ${TextOps.tokensSql("text")} AS toks FROM documents),
       |${p}occ AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
       |         unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
       |  FROM ${p}th WHERE len(toks) >= 2),
       |${p}refdoc AS (SELECT doc_id FROM ${p}th WHERE source IN ($refSqlList)),
       |${p}bc AS (SELECT o.w1, o.w2, count(*) AS cb FROM ${p}occ o JOIN ${p}refdoc r ON o.doc_id = r.doc_id GROUP BY 1, 2),
       |${p}uc AS (
       |  SELECT w, count(*) AS cw
       |  FROM (SELECT unnest(t.toks) AS w FROM ${p}th t JOIN ${p}refdoc r ON t.doc_id = r.doc_id)
       |  GROUP BY 1),
       |${p}v AS (SELECT count(*) AS v FROM ${p}uc),
       |${p}scored AS (
       |  SELECT o.doc_id, count(*) AS n_bigrams,
       |         round(CAST(sum(CASE WHEN c.cb IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS oov_frac,
       |         ${graft.functions.Rounding.exactAvgSql(
            s"ln((COALESCE(c.cb, 0) + 1.0) / (COALESCE(u.cw, 0) + v.v))", 12, 4)} AS avg_logp
       |  FROM ${p}occ o
       |  LEFT JOIN ${p}bc c ON o.w1 = c.w1 AND o.w2 = c.w2
       |  LEFT JOIN ${p}uc u ON o.w1 = u.w
       |  CROSS JOIN ${p}v v
       |  GROUP BY o.doc_id),
       |${p}n AS (SELECT count(*) AS n FROM ${p}scored),
       |${p}ranked AS (
       |  SELECT s.*, CAST(row_number() OVER (ORDER BY s.avg_logp DESC, s.doc_id ASC) AS BIGINT) AS rk
       |  FROM ${p}scored s),
       |$out AS (
       |  SELECT r.doc_id, r.n_bigrams, r.oov_frac, r.avg_logp,
       |         CASE WHEN r.rk * 3 <= n.n THEN 'head'
       |              WHEN r.rk * 3 <= n.n * 2 THEN 'middle'
       |              ELSE 'tail' END AS bucket
       |  FROM ${p}ranked r CROSS JOIN ${p}n n)""".stripMargin

  val oracle = Some(
    s"""WITH ${filterCtesSql("", "fb")}
       |SELECT doc_id, n_bigrams, oov_frac, avg_logp, bucket FROM fb""".stripMargin)
}
