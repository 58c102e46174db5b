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

  test("finalized sessions (watermark + EventTimeTimeout) == gap rule and w2 counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapSec = 1800L
    val rows = eventRows
    val maxMs = rows.map(_.ts.getTime).max
    val stream = MemoryStream[Event]
    val q = finalizedSessions(stream.toDS(), gapSec).writeStream
      .format("memory").queryName("stream_sessions").outputMode("append").start()
    try {
      val batches = rows.grouped(math.max(1, rows.size / 3)).toSeq
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      // Two far-future flush events (sentinel user) advance the watermark:
      // the first moves it past every real session's end + gap at the END of
      // its batch; the second triggers the timeout sweep that emits them.
      def flush(daysAhead: Int) = Event(
        -1L, new java.sql.Timestamp(maxMs + daysAhead * 86400000L), -1L, "flush", 0.0)
      stream.addData(flush(10)); q.processAllAvailable()
      stream.addData(flush(20)); q.processAllAvailable()
      val got = spark.table("stream_sessions")
        .filter(col("user_id") >= 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2))
      // Ground truth 1: the gap rule applied in plain Scala per user.
      val want = rows.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
        val secs = es.map(_.ts.getTime / 1000).sorted
        val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var start = secs.head
        var last = secs.head
        var n = 1L
        secs.tail.foreach { s =>
          if (s - last > gapSec) {
            sessions += ((uid, start, last, n)); start = s; n = 0L
          }
          last = s; n += 1
        }
        sessions += ((uid, start, last, n))
        sessions
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == want)
      // Ground truth 2: per-user (session count, event count) matches the
      // DuckDB-oracle-verified batch twin w2.
      val gotCounts = got.groupBy(_._1).view
        .mapValues(ss => (ss.length.toLong, ss.map(_._4).sum)).toMap
      val w2 = W2Sessions.run(spark, TestSpark.sf0001)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(gotCounts == w2)
    } finally q.stop()
  }

  test("finalized sessions widen, not rewind, on late in-watermark events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, sec: Long, uid: Long = 1L) =
      Event(id, new java.sql.Timestamp(sec * 1000L), uid, "x", 0.0)
    val stream = MemoryStream[Event]
    val q = finalizedSessions(stream.toDS(), gapSec = 600L, watermark = "30 minutes")
      .writeStream.format("memory").queryName("late_sessions").outputMode("append").start()
    try {
      // Batch 1 opens a session [10000, 10300]; batch 2 delivers an
      // in-watermark LATE event inside the open session (10100 > watermark
      // 10300-1800). It must widen the event count without rewinding the
      // session end (the pre-fix behavior set lastSec=10100, re-arming the
      // timeout early and emitting end_sec < its true value).
      // Global watermark discipline: each batch's max ts minus 30min must
      // stay BELOW every later late event, so batches are ordered to keep
      // the watermark at 8500 until user 2's 11300s arrive (wm → 9500).
      stream.addData(ev(1, 10000), ev(2, 10300)); q.processAllAvailable()
      stream.addData(ev(3, 10100)); q.processAllAvailable()
      // User 3: a late event BRIDGING two open sessions within the gap of
      // both must merge them into one (batch semantics of sorted events).
      stream.addData(ev(20, 9000, uid = 3L), ev(21, 10200, uid = 3L))
      q.processAllAvailable()
      stream.addData(ev(22, 9600, uid = 3L)); q.processAllAvailable()
      // User 2: a late event EARLIER than the open session by more than the
      // gap must form its own session (batch over {9800,11000,11300} gives
      // two sessions), not merge into the newer one.
      stream.addData(ev(10, 11000, uid = 2L), ev(11, 11300, uid = 2L))
      q.processAllAvailable()
      stream.addData(ev(12, 9800, uid = 2L)); q.processAllAvailable()
      stream.addData(ev(90, 10300 + 864000, uid = -1L)); q.processAllAvailable()
      stream.addData(ev(91, 10300 + 2 * 864000, uid = -1L)); q.processAllAvailable()
      def sessionsOf(uid: Long) = spark.table("late_sessions")
        .filter(col("user_id") === uid)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(sessionsOf(1L) == Seq((10000L, 10300L, 3L)))
      assert(sessionsOf(2L) == Seq((9800L, 9800L, 1L), (11000L, 11300L, 2L)))
      assert(sessionsOf(3L) == Seq((9000L, 10200L, 3L)))
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
