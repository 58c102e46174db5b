package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** t23: corpus DRIFT monitor — the distribution-shift report a production
  * pipeline computes between two corpus snapshots or slices (yesterday's
  * crawl vs today's, feed A vs feed B): Jensen-Shannon divergence between
  * the two slices' add-1-smoothed unigram distributions, plus the top-10
  * tokens by drift contribution — the "what changed" table an operator
  * actually reads when the divergence alarm fires. The slices here are the
  * even/odd halves of the source vocabulary (a deterministic stand-in for
  * two snapshot dates; the operator is slice-agnostic).
  *
  * Engine-exactness discipline (floats NEVER cross the gate): each token's
  * JS contribution 0.5·p·ln(p/m) + 0.5·q·ln(q/m) involves `ln`, whose last
  * ulp is not contractual across engines — so every contribution is
  * SNAPPED to the 1e-9 grid as a LONG (`round(term·1e9)`; a flip would
  * need the true value within ~1e-18 of a grid midpoint, and the 3-SF gate
  * would catch it), the global divergence is an exact integer SUM of those
  * longs (order-independent — no float accumulation anywhere), and the
  * top-10 ranking orders by the same grid longs with a token tie-break, so
  * both engines rank identically even where raw doubles differ by a ulp.
  * Output columns are integers and strings only.
  *
  * Per-token JS contributions are ≥ 0 (joint convexity of KL), so the
  * top-10 is genuinely the biggest drift drivers.
  *
  * Scale: one token-keyed count aggregate (map-side partials collapse
  * per-partition repeats), two 1-row global aggregates broadcast back
  * (the q24 1-row-dimension shape), and a TakeOrdered top-10 — no global
  * sort, vocabulary-bounded intermediate.
  */
object T23CorpusDrift extends GraftQuery {
  val name = "t23_corpus_drift"
  val describe = "corpus drift: JS divergence between slice unigram dists + top-10 drifted tokens"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
      .select((expr("CAST(substr(source, 4) AS INT)") % 2).as("grp"),
        explode(TextOps.tokens(col("text"))).as("tok"))
    val counts = d.groupBy(col("tok")).agg(
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("cnt_a"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cnt_b"))
    val totals = counts.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"),
      count(lit(1)).as("v"))
    val withP = counts.crossJoin(broadcast(totals))
      .withColumn("p", (col("cnt_a") + 1).cast("double") / (col("n_a") + col("v")))
      .withColumn("q", (col("cnt_b") + 1).cast("double") / (col("n_b") + col("v")))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term_e9",
        round((lit(0.5) * col("p") * log(col("p") / col("m"))
          + lit(0.5) * col("q") * log(col("q") / col("m"))) * 1e9).cast("long"))
    val js = withP.agg(sum(col("term_e9")).as("js_e9"))
    withP.crossJoin(broadcast(js))
      .select(col("tok"), col("cnt_a"), col("cnt_b"), col("term_e9"), col("js_e9"))
      .orderBy(col("term_e9").desc, col("tok").asc)
      .limit(10)
  }

  val oracle = Some(
    s"""WITH dt AS (
       |  SELECT CAST(substr(source, 4) AS INT) % 2 AS grp,
       |         unnest(${TextOps.tokensSql("text")}) AS tok
       |  FROM documents),
       |dc AS (
       |  SELECT tok,
       |         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
       |         CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
       |  FROM dt GROUP BY tok),
       |dtot AS (
       |  SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a, CAST(sum(cnt_b) AS BIGINT) AS n_b,
       |         CAST(count(*) AS BIGINT) AS v
       |  FROM dc),
       |dp AS (
       |  SELECT tok, cnt_a, cnt_b,
       |         CAST(cnt_a + 1 AS DOUBLE) / (n_a + v) AS p,
       |         CAST(cnt_b + 1 AS DOUBLE) / (n_b + v) AS q
       |  FROM dc CROSS JOIN dtot),
       |dterm AS (
       |  SELECT tok, cnt_a, cnt_b,
       |         CAST(round((0.5 * p * ln(p / ((p + q) / 2))
       |                     + 0.5 * q * ln(q / ((p + q) / 2))) * 1e9) AS BIGINT) AS term_e9
       |  FROM dp),
       |djs AS (SELECT CAST(sum(term_e9) AS BIGINT) AS js_e9 FROM dterm)
       |SELECT tok, cnt_a, cnt_b, term_e9, js_e9
       |FROM dterm CROSS JOIN djs
       |ORDER BY term_e9 DESC, tok ASC
       |LIMIT 10""".stripMargin)
}
