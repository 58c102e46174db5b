package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.{W1WindowAgg, W2Sessions}
import graft.streaming.EventStream._

/** The streaming operators inherit correctness from their oracle-verified
  * batch twins: same input events, streamed through micro-batches, must
  * produce the same aggregates the DuckDB-checked w1/w2 queries produce.
  */
class EventStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eventRows: Seq[Event] = {
    import spark.implicits._
    Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)
  }

  test("streaming windowed agg == oracle-verified batch twin (w1)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = windowedAgg(stream.toDF()).writeStream
      .format("memory").queryName("stream_w1").outputMode("complete").start()
    try {
      val (first, second) = eventRows.splitAt(eventRows.size / 2)
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      val got = spark.table("stream_w1")
        .select(col("w_start"), col("event_type"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      val want = W1WindowAgg.run(spark, TestSpark.sf0001)
        .collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(got.length == want.length)
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("streaming sessionization == oracle-verified batch twin (w2) across chronological batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = sessionCounts(stream.toDS()).writeStream
      .format("memory").queryName("stream_w2").outputMode("update").start()
    try {
      val batches = eventRows.grouped(math.max(1, eventRows.size / 3)).toSeq
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      // memory sink in update mode appends every emission; keep the last per user
      val got = spark.table("stream_w2")
        .withColumn("seq", monotonically_increasing_id())
        .groupBy(col("user_id"))
        .agg(max(struct(col("seq"), col("n_sessions"), col("n_events"))).as("s"))
        .select(col("user_id"), col("s.n_sessions").as("n_sessions"), col("s.n_events").as("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val want = W2Sessions.run(spark, TestSpark.sf0001)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally q.stop()
  }
}
