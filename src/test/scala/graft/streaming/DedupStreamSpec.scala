package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.streaming.EventStream._

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming dedup emits each event_id exactly once across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().toSeq.sortBy(_.ts.getTime)

    val stream = MemoryStream[Event]
    val q = dedupStream(stream.toDF()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.size / 2)
      // Batch 1: first half plus duplicates of some of its rows.
      stream.addData(a ++ a.take(50)); q.processAllAvailable()
      // Batch 2: second half plus CROSS-BATCH duplicates of batch 1 rows.
      stream.addData(b ++ a.slice(100, 150)); q.processAllAvailable()
      val out = spark.table("dedup_out")
      assert(out.count() == rows.size, "exactly-once violated")
      assert(out.select(col("event_id")).distinct().count() == rows.size)
    } finally q.stop()
  }
}
