package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q24: Z-ORDER layout clustering — the data-layout operator behind
  * multi-dimensional file skipping (Delta/Iceberg `OPTIMIZE ZORDER`,
  * public Morton-curve literature): map each row's (x, y) key pair onto a
  * space-filling curve and cluster storage by curve position, so a range
  * predicate on EITHER dimension prunes most files by their min/max
  * footer stats. A single-column sort gives perfect pruning on that column
  * and none on the other; the z-curve trades a little of each for bounded
  * pruning on both — at 100 TB this is the difference between scanning one
  * dimension's stripe (10² files) and the whole table (10⁵ files) for a
  * two-dimensional selection.
  *
  * Construction (all integer arithmetic — no rounding discipline needed,
  * both engines agree bit-for-bit):
  *   1. EXTENT: min/max of each dimension via one 1-row broadcast aggregate
  *     (the range boundaries a production OPTIMIZE computes the same way);
  *   2. GRID: each dimension bins monotonically to 8 bits —
  *      `(v − min)·256 div (max − min + 1)` ∈ [0, 255];
  *   3. CURVE: the 16-bit Morton value interleaves the bits
  *      (x→even, y→odd positions);
  *   4. CLUSTER: storage unit = `z div 256` (256 cells per unit, the file
  *      granularity stand-in). The surface reports each unit's row count
  *      and min/max grid extent per dimension — exactly the footer stats a
  *      scan planner would prune on.
  *
  * The z-curve's alignment property makes the layout claim ASSERTABLE, not
  * anecdotal: 256 consecutive cells of a 2×8-bit Morton curve are one
  * ALIGNED 16×16 TILE, so every unit's extent is ≤ 16 cells per dimension
  * (ZOrderSpec pins it, plus the pruning arithmetic: an x-slab predicate
  * touches ≤ 16 of the 256 units where a y-sorted layout touches all).
  * Scale shape: two scans (extent + projection) and one partial-aggregated
  * groupBy on the unit id; the real write path is `repartitionByRange(z)`
  * + q20's partitioned sink — layout, not computation, so the declared
  * surface is the stats table the layout exists to produce.
  */
object Q24ZOrder extends GraftQuery {
  val name = "q24_zorder"
  val describe = "z-order layout clustering: Morton-curve units with per-unit min/max pruning stats"

  private val bits = 8

  /** Morton interleave of two `bits`-bit ints: x → even, y → odd. */
  private def morton(x: Column, y: Column): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)

  private def mortonSql(x: String, y: String): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(
      col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val extent = li.agg(
      min(col("x")).as("minx"), max(col("x")).as("maxx"),
      min(col("y")).as("miny"), max(col("y")).as("maxy"))
    // Integer `div` (not `/`, which is double division) keeps every value
    // on the integer path both engines compute exactly.
    val grid = li.crossJoin(broadcast(extent)).select(
      expr("CAST((x - minx) * 256 div (maxx - minx + 1) AS INT)").as("xb"),
      expr("CAST((y - miny) * 256 div (maxy - miny + 1) AS INT)").as("yb"))
    grid
      .select(col("xb"), col("yb"),
        shiftright(morton(col("xb"), col("yb")), 8).as("unit"))
      .groupBy(col("unit"))
      .agg(count(lit(1)).as("n"),
        min(col("xb")).as("min_x"), max(col("xb")).as("max_x"),
        min(col("yb")).as("min_y"), max(col("yb")).as("max_y"))
  }

  val oracle = Some(
    s"""WITH ext AS (
       |  SELECT min(l_partkey) AS minx, max(l_partkey) AS maxx,
       |         min(l_suppkey) AS miny, max(l_suppkey) AS maxy
       |  FROM lineitem),
       |grid AS (
       |  SELECT CAST((l_partkey - minx) * 256 // (maxx - minx + 1) AS INT) AS xb,
       |         CAST((l_suppkey - miny) * 256 // (maxy - miny + 1) AS INT) AS yb
       |  FROM lineitem CROSS JOIN ext),
       |z AS (
       |  SELECT xb, yb, (${mortonSql("xb", "yb")}) >> 8 AS unit
       |  FROM grid)
       |SELECT unit, count(*) AS n,
       |       min(xb) AS min_x, max(xb) AS max_x,
       |       min(yb) AS min_y, max(yb) AS max_y
       |FROM z GROUP BY unit""".stripMargin)
}
