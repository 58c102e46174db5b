package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.TextOps

/** t24: HyperLogLog distinct-token cardinality per source — THE 100-TB
  * distinct-count operator (Flajolet–Fuchs–Gandouet–Meunier 2007). t15's
  * count-min answers "how often"; this answers "how many distinct" with the
  * same fixed-state discipline: m=512 six-bit registers per group replace
  * an O(vocabulary) distinct shuffle, and the register array merges by
  * element-wise MAX — so Spark's partial aggregation IS the sketch merge
  * (each partition builds its own registers, the shuffle maxes them), and
  * the identical max-merge works across shards, days, or a stream
  * (HllSpec pins split-merge equality).
  *
  * Portability is the whole design: Spark's own `approx_count_distinct`
  * is HLL++ with an engine-private hash, so it can never cross a DuckDB
  * hash gate. This variant is deterministic end to end —
  *   h   = Portable.hash60(token)           (md5-backed, engine-identical)
  *   reg = h & 511, w = h >> 9              (51-bit suffix)
  *   rank = trailing-zeros(w)+1, capped 40  (bit_count((w & -w)-1)+1 — a
  *          geometric variable identical in law to the leading-zero form)
  * and every register max / 2^(40-rank) summand is BIGINT-exact: the
  * harmonic sum is kept as the scaled integer S = Σ 2^(40-M_j) (≤ 512·2^40
  * < 2^49), so the only floating-point steps are ONE literal-over-integer
  * division est = C/S (C = α·m²·2^40 precomputed as a shared literal — one
  * IEEE op, bit-identical across engines), the standard V>0, est ≤ 2.5m
  * linear-counting branch m·ln(m/V) (ln's last ulp snapped to the 1e-9
  * grid as a LONG, t23's discipline), and the grid snap itself. The
  * large-range correction is unnecessary at a 60-bit hash (collisions at
  * 2^30 cardinalities are the 32-bit hash's disease) and is omitted.
  *
  * Rank is a pure function of the hash, so max-over-occurrences equals
  * max-over-distinct — the stream never needs a distinct before sketching.
  * The exact `count(DISTINCT token)` published beside the estimate is the
  * deliberate unscalable comparator (a vocabulary-sized shuffle the sketch
  * exists to replace; at 100 TB you drop that column and keep the
  * registers), and HllSpec pins the relative error against it under the
  * m=512 theoretical σ≈1.04/√m≈4.6%.
  */
object T24HllCardinality extends GraftQuery {
  val name = "t24_hll_cardinality"
  val describe = "per-source HyperLogLog distinct-token estimate (m=512, portable hash) vs exact"

  private val m = 512
  private val rankCap = 40
  /** α_512 · 512² · 2^40 as one shared double literal: both engines divide
    * this constant by the exact integer S, so the raw estimate is a single
    * identical IEEE operation. (α_m = 0.7213/(1+1.079/m).)
    */
  private val estC = "2.0746335750037248e17"
  private val linearCut = 2.5 * m // standard small-range switch: est <= 2.5m

  /** Trailing-zero rank of the 51-bit suffix, capped — shared SQL fragment
    * (bit_count/least/CASE parse identically in Spark SQL and DuckDB).
    */
  private def rankSql(w: String): String =
    s"CASE WHEN $w = 0 THEN $rankCap ELSE least(bit_count(($w & (-($w))) - 1) + 1, $rankCap) END"

  /** 2^(rankCap - M_j) as BIGINT — the exact harmonic-sum summand. */
  private def summandSql(mr: String): String =
    s"shiftleft(CAST(1 AS BIGINT), $rankCap - $mr)"
  private def summandDuck(mr: String): String =
    s"(CAST(1 AS BIGINT) << ($rankCap - $mr))"

  /** est → published 1e-9-grid LONG, with the linear-counting branch. */
  private def estE9Sql(s: String, v: String): String =
    s"""CAST(floor(CASE WHEN $v > 0 AND $estC / CAST($s AS DOUBLE) <= $linearCut
       | THEN $m.0 * ln($m.0 / $v) ELSE $estC / CAST($s AS DOUBLE) END * 1e9 + 0.5) AS BIGINT)""".stripMargin.replaceAll("\n", "")

  /** Register build over a (source, text) frame: bounded keyspace
    * (sources × 512), map-side partial max — each partition's local
    * registers ARE a complete sub-sketch, and sketches over ANY disjoint
    * split of the corpus merge to this by element-wise max (HllSpec pins
    * split-merge identity, the property that makes the sketch shard- and
    * stream-mergeable at 100 TB).
    */
  def registers(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      .select(col("source"), Portable.hash60(col("token")).as("h"))
      .select(
        col("source"),
        col("h").bitwiseAND(lit((m - 1).toLong)).as("reg"),
        expr(rankSql("shiftright(h, 9)")).as("rank"))
      .groupBy(col("source"), col("reg")).agg(max(col("rank")).as("mr"))

  /** (source, reg, mr) registers → (source, v_zero, s_scaled, est_e9). */
  def estimate(regs: DataFrame): DataFrame =
    regs.groupBy(col("source")).agg(
      count(lit(1)).as("nreg"),
      sum(expr(summandSql("mr"))).as("s_present"))
      .select(
        col("source"),
        (lit(m.toLong) - col("nreg")).cast("long").as("v_zero"),
        (col("s_present") + (lit(m.toLong) - col("nreg")) * shiftleft(lit(1L), rankCap)).as("s_scaled"))
      .select(col("source"), col("v_zero"), col("s_scaled"),
        expr(estE9Sql("s_scaled", "v_zero")).as("est_e9"))

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val hll = estimate(registers(docs))
    // The comparator the sketch replaces — vocabulary-sized, test-SF only.
    val exact = docs
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("source")).agg(countDistinct(col("token")).as("n_exact"))
    hll.join(broadcast(exact), Seq("source"))
  }

  val oracle = Some(
    s"""WITH tok AS (
       |  SELECT source, unnest(${TextOps.tokensSql("text")}) AS token FROM documents),
       |h AS (SELECT source, token, ${Portable.hash60Sql("token")} AS h FROM tok),
       |rk AS (
       |  SELECT source, h & ${m - 1} AS reg, ${rankSql("(h >> 9)")} AS rank FROM h),
       |regs AS (SELECT source, reg, max(rank) AS mr FROM rk GROUP BY 1, 2),
       |hll AS (
       |  SELECT source, CAST($m - count(*) AS BIGINT) AS v_zero,
       |         CAST(sum(${summandDuck("mr")}) + ($m - count(*)) * (CAST(1 AS BIGINT) << $rankCap) AS BIGINT) AS s_scaled
       |  FROM regs GROUP BY source),
       |ex AS (SELECT source, count(DISTINCT token) AS n_exact FROM h GROUP BY source)
       |SELECT hll.source, v_zero, s_scaled,
       |       ${estE9Sql("s_scaled", "v_zero")} AS est_e9, n_exact
       |FROM hll JOIN ex ON hll.source = ex.source""".stripMargin)
}
