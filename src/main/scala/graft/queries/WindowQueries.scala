package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** w1: 5-minute tumbling-window aggregation over the events table — the
  * batch twin of the Structured Streaming pipeline in
  * [[graft.streaming]] (same bucketing arithmetic), so the streaming path
  * can be cross-checked against this oracle-verified query.
  *
  * Bucketing is integer arithmetic on epoch seconds (Spark `unix_timestamp`
  * truncates, DuckDB `epoch` is fractional — hence the explicit floor).
  * Partial aggregation collapses each scan partition to |windows|×|types|
  * rows before the shuffle.
  */
object W1WindowAgg extends GraftQuery {
  val name = "w1_window_agg"
  val describe = "5-min tumbling window counts/sums over events (batch twin of streaming agg)"

  private val widthSec = 300L

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("w_start", (floor(unix_timestamp(col("ts")) / widthSec) * widthSec).cast("long"))
      .groupBy(col("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))

  val oracle = Some(
    s"""SELECT CAST(floor(epoch(ts) / $widthSec) * $widthSec AS BIGINT) AS w_start,
       |       event_type,
       |       count(*) AS n_events,
       |       round(sum(value), 4) AS sum_value
       |FROM events
       |GROUP BY 1, 2""".stripMargin)
}

/** w2: sessionization — split each user's event stream at >30-minute gaps
  * (lag window), count sessions and events. The reference has no
  * window/state operators at all (SURVEY §2.E); this is the batch form of
  * the streaming `mapGroupsWithState` session operator.
  *
  * Scale: one shuffle on user_id (the window partition key), then a
  * per-partition sort — the standard sessionization shape. Skewed users
  * (bots) would need salting + two-phase reassembly; at this surface the
  * per-user event counts are bounded.
  */
object W2Sessions extends GraftQuery {
  val name = "w2_sessions"
  val describe = "sessionization: >30min gap splits per user, session/event counts"

  private val gapSec = 1800L

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, sfDir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev_sec", lag(col("sec"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > gapSec, 1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  val oracle = Some(
    s"""WITH t AS (
       |  SELECT user_id,
       |         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
       |         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_sec
       |  FROM events)
       |SELECT user_id,
       |       CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > $gapSec THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       |       count(*) AS n_events
       |FROM t
       |GROUP BY user_id""".stripMargin)
}
