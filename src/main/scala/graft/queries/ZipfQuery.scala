package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** t16: Zipf rank–frequency profile — the corpus-health diagnostic LLM data
  * work uses to spot synthetic/degenerate corpora: natural-language token
  * frequencies follow freq ∝ rank^s with s ≈ −1, and a corpus whose fitted
  * slope drifts far from −1 (too flat: random/encrypted text; too steep:
  * template spam) fails the health check before any model sees it. Output is
  * the top-[[topN]] tokens with rank and frequency, plus the corpus-level
  * OLS slope of ln(freq) on ln(rank) as a constant column.
  *
  * Shape at scale: token counting is the vocabulary-bounded grouped count
  * (t6's shape — shuffle keyed on the token, map-side combined, output size
  * = |vocab| not corpus size); the top-N is a TakeOrdered (per-partition
  * top-N, no global sort); ranking and the regression then run on N rows.
  * Nothing downstream of the count touches more than [[topN]] rows.
  *
  * Determinism/parity: the top-N boundary and ranks are totally ordered by
  * (freq DESC, token ASC); ln is the only inexact op — per-term ulp noise is
  * ≤1e-15, so the four OLS sums are rounded to 9 decimals on both sides
  * before the closed-form slope (g1's per-round-rounding precedent), and the
  * slope itself to 6.
  */
object T16Zipf extends GraftQuery {
  val name = "t16_zipf"
  val describe = "Zipf profile: top-100 token rank/freq + OLS slope of ln(freq) on ln(rank)"

  private val topN = 100
  private val sumScale = 9

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("freq"))
    // orderBy+limit compiles to TakeOrderedAndProject — per-partition top-N,
    // never a global sort of the vocabulary.
    val top = counts.orderBy(col("freq").desc, col("token").asc).limit(topN)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
    val x = log(col("rank").cast("double"))
    val y = log(col("freq").cast("double"))
    val stats = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      round(sum(x), sumScale).as("sx"),
      round(sum(y), sumScale).as("sy"),
      round(sum(x * y), sumScale).as("sxy"),
      round(sum(x * x), sumScale).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    ranked.crossJoin(broadcast(stats))
      .select(col("rank"), col("token"), col("freq"),
        round(slope, 6).as("zipf_slope"))
  }

  val oracle = Some(
    s"""WITH toks AS (
       |  SELECT unnest(${TextOps.tokensSql("text")}) AS token FROM documents),
       |counts AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
       |top AS (SELECT token, freq FROM counts ORDER BY freq DESC, token ASC LIMIT $topN),
       |ranked AS (
       |  SELECT token, freq,
       |         row_number() OVER (ORDER BY freq DESC, token ASC) AS rank
       |  FROM top),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |         round(sum(ln(CAST(rank AS DOUBLE))), $sumScale) AS sx,
       |         round(sum(ln(CAST(freq AS DOUBLE))), $sumScale) AS sy,
       |         round(sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(freq AS DOUBLE))), $sumScale) AS sxy,
       |         round(sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))), $sumScale) AS sxx
       |  FROM ranked)
       |SELECT r.rank, r.token, r.freq,
       |       round((s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx), 6) AS zipf_slope
       |FROM ranked r CROSS JOIN stats s""".stripMargin)
}
