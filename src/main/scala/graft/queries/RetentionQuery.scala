package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** w7: cohort retention — the engagement matrix every event-analytics
  * surface ships: users are grouped into weekly cohorts by their FIRST
  * event, and each (cohort week, week offset) cell counts the distinct
  * cohort members active that many weeks later. Offset 0 is the cohort's
  * own size, so a row reads as a survival curve.
  *
  * Scale shape: two keyed shuffles — the per-user minimum (partial+final
  * aggregate on user_id) and the per-cell distinct count (Spark expands
  * count(DISTINCT) into a two-phase aggregate keyed on
  * (cohort, offset, user), both map-side combined). The first-event frame
  * joins back to events on user_id — a plain hash join that AQE broadcasts
  * when the user dimension fits, and that bucketing on user_id co-locates
  * at warehouse scale. Nothing is windowed over the full event stream and
  * nothing visits the driver.
  *
  * Determinism: week truncation and day arithmetic are exact calendar
  * integer ops on both engines (both truncate to Monday); counts are
  * integers — no floating point anywhere.
  */
object W7Retention extends GraftQuery {
  val name = "w7_retention"
  val describe = "weekly cohort retention matrix: distinct users per (first-event week, week offset)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("ts"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    ev.join(cohorts, "user_id")
      .select(col("user_id"), col("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count_distinct(col("user_id")).as("active_users"))
  }

  val oracle = Some(
    """WITH cohorts AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id)
      |SELECT c.cohort_week,
      |       CAST(date_diff('day', c.cohort_week, date_trunc('week', e.ts)) // 7 AS BIGINT) AS week_offset,
      |       count(DISTINCT e.user_id) AS active_users
      |FROM events e JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2""".stripMargin)
}
