package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.T21MarkupStrip

/** Extract-at-the-edge parity: EventStream.markupGate over crawl frames
  * arriving as a stream must reproduce t21's batch strip byte for byte —
  * script/tag counts equal and cleaned text identical. The gate reads
  * T21MarkupStrip's own patterns and stripCol, so this is structural; the
  * spec catches a re-derived pattern or an accidentally stateful gate, and
  * completes the every-batch-stage-has-a-streaming-twin story for the
  * extraction front of the pipeline.
  */
class MarkupGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed markup strip equals the batch expressions, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Batch truth: the same wrapped fixture t21 strips, with batch-side
    // counts and cleaned text from T21MarkupStrip's expressions.
    val fixture = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        T21MarkupStrip.htmlCol(col("doc_id"), col("text")).as("html"))
    val batch = fixture.select(
      col("doc_id"),
      size(regexp_extract_all(col("html"), lit(T21MarkupStrip.scriptRe), lit(0)))
        .as("n_scripts"),
      T21MarkupStrip.stripCol(col("html")).as("clean_text"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap

    // Online: identical rows in three micro-batches through the gate.
    val rows = fixture.as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val gated = EventStream.markupGate(stream.toDF().toDF("doc_id", "html"))
    val q = gated.select(col("doc_id"), col("n_scripts"), col("clean_text"))
      .writeStream.format("memory").queryName("markup_gate_out")
      .outputMode("append").start()
    try {
      val thirds = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val out = spark.table("markup_gate_out").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(out.size == batch.size, s"row count ${out.size} != ${batch.size}")
      val diffs = batch.collect { case (id, bv) if out(id) != bv => id }
      assert(diffs.isEmpty, s"${diffs.size} docs diverged; first: ${diffs.headOption}")
      // and the gate emitted no residual markup: no tags survive, script
      // bodies died WITH their blocks (the hostile-fixture property)
      spark.table("markup_gate_out").collect().foreach { r =>
        val clean = r.getString(2)
        assert(!clean.contains("<") && !clean.contains(">"),
          s"residual tag in doc ${r.getLong(0)}")
        assert(!clean.contains("var x="), s"script body leaked in doc ${r.getLong(0)}")
      }
    } finally q.stop()
  }
}
