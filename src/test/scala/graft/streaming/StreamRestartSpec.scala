package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The A11 fail-over story on the streaming surface: a checkpointed
  * stateful query (finalizedSessions — watermark + flatMapGroupsWithState)
  * is killed mid-stream and RESUMED as a new query over the same
  * checkpoint, against a replayable file source and an exactly-once file
  * sink. The final output must equal the plain-Scala gap-rule ground truth
  * exactly — no session lost (state restored across the restart), none
  * emitted twice (sink manifest + restored source offsets).
  *
  * This is the piece the MemoryStream specs can't show: MemoryStream state
  * dies with the query, so only a durable-source + checkpoint round trip
  * demonstrates that sessions OPEN at the kill point survive it — the
  * streaming analogue of Iterate's checkpoint-resume (A11,
  * `AbstractMasterCoordinator.java:194-238`).
  */
class StreamRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("kill + checkpoint-resume: exactly-once sessions, open state survives the restart") {
    import spark.implicits._
    val gapSec = 1800L
    val base = java.nio.file.Files.createTempDirectory("restart").toString
    val (srcDir, outDir, chkDir) = (s"$base/src", s"$base/out", s"$base/chk")

    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStream.Event].collect().sortBy(_.ts.getTime).toSeq
    val maxMs = rows.map(_.ts.getTime).max
    // ground truth (the EventStreamSpec gap rule).
    val truth = rows.groupBy(_.user_id).toSeq.flatMap { case (uid, es) =>
      val secs = es.map(_.ts.getTime / 1000).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var start = secs.head; var last = secs.head; var n = 1L
      secs.tail.foreach { s =>
        if (s - last > gapSec) { out += ((uid, start, last, n)); start = s; n = 0L }
        last = s; n += 1
      }
      out += ((uid, start, last, n))
      out
    }.sortBy(t => (t._1, t._2))
    // Kill INSIDE the longest multi-event session — at its final event —
    // so that session is provably open (started, not finalizable) when the
    // query dies, and only a restored state store can complete it. An
    // arbitrary midpoint cut can land between everyone's sessions on this
    // bursty fixture (it did), proving nothing about state.
    val target = truth.filter(s => s._4 >= 2 && s._3 > s._2).maxBy(_._4)
    val cutSec = target._3
    val cut = rows.indexWhere(_.ts.getTime / 1000 >= cutSec)
    assert(cut > 0 && cut < rows.size)
    val spanning = truth.count(s => s._2 < cutSec && s._3 >= cutSec)
    assert(spanning > 0,
      s"fixture must have sessions open at the kill point (cut=$cutSec)")

    def writeChunk(chunk: Seq[EventStream.Event]): Unit =
      chunk.toDS().coalesce(1).write.mode("append").parquet(srcDir)

    def startQuery() = EventStream.finalizedSessions(
      spark.readStream
        .schema(org.apache.spark.sql.Encoders.product[EventStream.Event].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(srcDir)
        .as[EventStream.Event],
      gapSec)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", chkDir)
      .outputMode("append")
      .start()

    // Phase 1: first half arrives, query runs, then is killed cold.
    rows.take(cut).grouped(cut / 2 + 1).foreach(writeChunk)
    val q1 = startQuery()
    val b1 = try { q1.processAllAvailable(); q1.lastProgress.batchId } finally q1.stop()

    // Phase 2: rest of the stream + two watermark-flush files land while
    // the query is DOWN; a brand-new query resumes from the checkpoint.
    rows.drop(cut).grouped((rows.size - cut) / 2 + 1).foreach(writeChunk)
    def flush(days: Int) = EventStream.Event(
      -1L, new java.sql.Timestamp(maxMs + days * 86400000L), -1L, "flush", 0.0)
    writeChunk(Seq(flush(10)))
    writeChunk(Seq(flush(20)))
    val q2 = startQuery()
    val b2 = try { q2.processAllAvailable(); q2.lastProgress.batchId } finally q2.stop()
    assert(b2 > b1, s"restart did not resume from the checkpoint (batch $b2 <= $b1)")

    // Exactly once: the committed sink (manifest-filtered batch read)
    // equals the ground truth — sessions spanning the kill survived via
    // restored state, and nothing was re-emitted by the replay.
    val got = spark.read.parquet(outDir)
      .filter(col("user_id") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == truth,
      s"restart broke exactly-once: got ${got.length} sessions, want ${truth.length}")
  }
}
