package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.streaming.EventStream.Event

/** Stream-stream interval join: clicks joined to same-user purchases within
  * the preceding hour — watermarks on both sides bound the join state. The
  * batch equivalent (same predicate as a static join) is the correctness
  * reference.
  */
class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def joinClause(c: DataFrame, p: DataFrame): DataFrame =
    c.alias("c").join(p.alias("p"),
      col("c.user_id") === col("p.user_id") &&
        col("p.ts") <= col("c.ts") &&
        col("p.ts") >= col("c.ts") - expr("INTERVAL 1 HOUR"))
      .select(col("c.event_id").as("click_id"), col("p.event_id").as("purchase_id"))

  test("stream-stream interval join matches the static join on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
    val clicks = ev.filter(_.event_type == "click")
    val purchases = ev.filter(_.event_type == "purchase")

    val cStream = MemoryStream[Event]
    val pStream = MemoryStream[Event]
    val joined = joinClause(
      cStream.toDF().withWatermark("ts", "2 hours"),
      pStream.toDF().withWatermark("ts", "2 hours"))
    val q = joined.writeStream.format("memory")
      .queryName("stream_join_out").outputMode("append").start()
    try {
      // Two chronological halves per side.
      val (c1, c2) = clicks.splitAt(clicks.size / 2)
      val (p1, p2) = purchases.splitAt(purchases.size / 2)
      cStream.addData(c1); pStream.addData(p1); q.processAllAvailable()
      cStream.addData(c2); pStream.addData(p2); q.processAllAvailable()
      val got = spark.table("stream_join_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val evDf = Tables.events(spark, TestSpark.sf0001)
      val want = joinClause(
        evDf.filter(col("event_type") === "click"),
        evDf.filter(col("event_type") === "purchase"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"stream join ${got.size} pairs vs batch ${want.size}")
      assert(want.nonEmpty, "degenerate test: no qualifying pairs")
    } finally q.stop()
  }
}
