package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** q18: CUBE grouping sets — all 2^k subtotal combinations in one Expand +
  * aggregate pass (completes the grouping-sets family next to q11's
  * ROLLUP).
  */
object Q18Cube extends GraftQuery {
  val name = "q18_cube"
  val describe = "CUBE(l_returnflag, l_linestatus) counts/sums (all subtotal combinations)"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))

  val oracle = Some(
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)
}

/** w5: trailing-window statistics — each event's value z-scored against its
  * user's previous 10 events (frame `ROWS BETWEEN 10 PRECEDING AND 1
  * PRECEDING`): the standard leakage-free trailing-feature shape for
  * training pipelines (the current row never sees itself). One shuffle on
  * the window key; rows with fewer than 2 predecessors yield NULL stats on
  * both engines.
  */
object W5TrailingStats extends GraftQuery {
  val name = "w5_trailing_stats"
  val describe = "per-user trailing mean/std + z-score over previous 10 events"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-10, -1)
    Tables.events(spark, sfDir)
      .withColumn("t_mean", avg(col("value")).over(w))
      .withColumn("t_std", stddev_samp(col("value")).over(w))
      .select(
        col("event_id"), col("user_id"),
        round(col("t_mean"), 6).as("trail_mean"),
        round(col("t_std"), 6).as("trail_std"),
        // NULL z for a zero-variance window: the engines disagree on double
        // division by zero (NULL vs IEEE inf/nan), so guard on both sides.
        round((col("value") - col("t_mean")) / nullif(col("t_std"), lit(0.0)), 6).as("z"))
  }

  val oracle = Some(
    """SELECT event_id, user_id,
      |       round(t_mean, 6) AS trail_mean,
      |       round(t_std, 6) AS trail_std,
      |       round((value - t_mean) / nullif(t_std, 0), 6) AS z
      |FROM (
      |  SELECT event_id, user_id, value,
      |         avg(value) OVER w AS t_mean,
      |         stddev_samp(value) OVER w AS t_std
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))""".stripMargin)
}
