package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AsOfJoin

/** j3: as-of join — each click matched to the user's most recent purchase at
  * or before the click. Our implementation composes built-ins
  * ([[graft.operators.AsOfJoin]]: union + carry-forward window, one
  * shuffle); the oracle uses DuckDB's NATIVE `ASOF JOIN` operator, so the
  * two engines cross-check genuinely independent implementations of the
  * semantics.
  *
  * Determinism caveat: if two purchases of one user shared an identical
  * microsecond timestamp, the tie-winner's value would be engine-defined;
  * the generated data has no such collisions (asserted in AsOfJoinSpec), so
  * the matched value is well-defined on this surface.
  */
object J3AsOf extends GraftQuery {
  val name = "j3_asof"
  val describe = "as-of join: click -> latest prior purchase per user (union+window vs native ASOF)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value").as("purchase_value"))
    AsOfJoin.asOf(clicks, purchases, key = "user_id", time = "ts",
      rightCols = Seq("purchase_value"))
      .filter(col("asof_purchase_value").isNotNull) // inner-asof semantics
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("click_sec"),
        round(col("asof_purchase_value"), 4).as("purchase_value"))
  }

  val oracle = Some(
    """WITH clicks AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      |purchases AS (
      |  SELECT user_id, ts, value AS purchase_value FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id,
      |       CAST(floor(epoch(c.ts)) AS BIGINT) AS click_sec,
      |       round(p.purchase_value, 4) AS purchase_value
      |FROM clicks c ASOF JOIN purchases p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts""".stripMargin)
}
