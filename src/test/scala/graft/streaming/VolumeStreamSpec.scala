package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.W11VolumeAnomaly

/** Volume monitoring as a live stage: EventStream.dailyVolume over events
  * arriving in arbitrary micro-batches must land on exactly the
  * (event_type, day, cnt) table batch w11 counts — count merge is
  * addition, which IS stateful grouped counting — and because the counts
  * are exact integers, `W11VolumeAnomaly.zScores` over the streamed
  * snapshot equals the batch w11 table BIT FOR BIT.
  */
class VolumeStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed daily counts equal batch w11's; z-scores from them match bit-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type"), col("ts"))
    val rows = events.as[(String, Timestamp)].collect().toSeq

    val batch = W11VolumeAnomaly.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

    val stream = MemoryStream[(String, Timestamp)]
    val counts = EventStream.dailyVolume(stream.toDF().toDF("event_type", "ts"))
    val q = counts.writeStream.format("memory").queryName("vol_counts")
      .outputMode("complete").start()
    try {
      rows.grouped(math.max(1, rows.size / 3 + 1)).foreach { part =>
        stream.addData(part); q.processAllAvailable()
      }
      // materialize the snapshot into a fresh frame: zScores self-joins its
      // input, and a memory-sink VIEW referenced twice fails attribute
      // dedup (INTERNAL_ERROR conflicting references) — a monitoring job
      // reading the sink gets a fresh frame the same way
      val snapshot = spark.table("vol_counts")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        .toDF("event_type", "day", "cnt")
      val streamedZ = W11VolumeAnomaly.zScores(snapshot)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
      assert(streamedZ == batch,
        s"first diff: ${batch.find(kv => streamedZ.get(kv._1) != Some(kv._2))}")
    } finally q.stop()
  }
}
