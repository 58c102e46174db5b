package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.PiiOps

/** Redact-at-the-edge parity: EventStream.piiGate over documents arriving
  * as a stream must reproduce the batch PII surface row for row — counts
  * equal to t20's and redacted text byte-identical to p8's input
  * expressions. The gate reads PiiOps's own patterns and replacement chain,
  * so this is structural; the spec catches a re-derived pattern (skew) or
  * an accidentally stateful gate.
  */
class PiiGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed redaction equals the batch expressions, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Batch truth: the same fixture text p8/t20 scan, with batch-side
    // counts and redaction from PiiOps's expressions.
    val fixture = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        PiiOps.piiTextCol(col("doc_id"), col("text"), col("source")).as("text"))
    val batch = fixture.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(PiiOps.emailRe), lit(0)))
        .as("n_emails"),
      PiiOps.redactCol(col("text")).as("redacted"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap

    // Online: identical rows in three micro-batches through the gate.
    val rows = fixture.as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val gated = EventStream.piiGate(stream.toDF().toDF("doc_id", "text"))
    val q = gated.select(col("doc_id"), col("n_emails"), col("redacted"))
      .writeStream.format("memory").queryName("pii_gate_out")
      .outputMode("append").start()
    try {
      val thirds = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val out = spark.table("pii_gate_out").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
      assert(out.size == batch.size, s"row count ${out.size} != ${batch.size}")
      val diffs = batch.collect { case (id, bv) if out(id) != bv => id }
      assert(diffs.isEmpty, s"${diffs.size} docs diverged; first: ${diffs.headOption}")
      // and the gate emitted no unredacted entity
      spark.table("pii_gate_out").collect().foreach { r =>
        val red = r.getString(2)
        for (p <- Seq(PiiOps.emailRe, PiiOps.phoneRe, PiiOps.ipRe))
          assert(!p.r.findFirstIn(red).isDefined, s"residual match in doc ${r.getLong(0)}")
      }
    } finally q.stop()
  }
}
