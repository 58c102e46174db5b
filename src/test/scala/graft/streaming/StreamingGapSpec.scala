package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.W9InterArrival
import graft.streaming.EventStream._

/** gapStream (stateful per-user inter-arrival extraction) must reproduce the
  * oracle-verified batch histogram (w9) under arbitrary micro-batch splits —
  * the cross-batch gap (state's lastSec → next batch's first event) is
  * exactly what distinguishes the stateful operator from a per-batch window.
  */
class StreamingGapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed gap multiset over 3 micro-batches == batch w9 histogram") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val stream = MemoryStream[Event]
    val q = gapStream(stream.toDS()).writeStream
      .format("memory").queryName("stream_gaps").outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.size / 3)).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
      val gaps = spark.table("stream_gaps").collect().map(_.getLong(1))
      // Capped at 2^30 like the engine's CASE chain (the top bucket is
      // open-ended), so a >= 2^31 gap buckets identically on both paths.
      def bucketLo(gap: Long): Long =
        if (gap <= 0) 0L else math.min(java.lang.Long.highestOneBit(gap), 1L << 30)
      val got = gaps.groupBy(bucketLo).map { case (lo, g) =>
        (lo, g.length.toLong,
          BigDecimal(g.sum.toDouble / g.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(g.length.toDouble / gaps.length).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy(_._1)
      val want = W9InterArrival.run(spark, TestSpark.sf0001)
        .select(col("gap_lo"), col("n"), col("avg_gap_s"), col("share"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq.sortBy(_._1)
      assert(got == want,
        s"streamed histogram drifted from batch w9:\n  got  $got\n  want $want")
      // The split is mid-stream for most users, so cross-batch gaps existed.
      assert(gaps.length > rows.map(_.user_id).distinct.size,
        "no multi-event users — the cross-batch path was not exercised")
    } finally q.stop()
  }
}
