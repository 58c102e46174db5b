package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Fingerprint-at-the-edge parity: EventStream.winnowGate over documents
  * arriving as a stream must reproduce t29's batch winnowing profile
  * bit-exactly — gram/window/fingerprint counts, the XOR set digest, and
  * the rounded density. The gate computes the window minima with per-row
  * array combinators while t29 uses a doc_id-partitioned SQL window, so
  * the spec pins that the two formulations select the SAME fingerprint
  * sets (the Schleimer minima are per-document — formulation must not
  * matter), and that too-short documents are stamped null rather than
  * dropped. Completes the every-extraction-front-stage-has-a-streaming-
  * twin story (t21 markupGate, t20 piiGate, p13 splitGate precedents).
  */
class WinnowGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed winnow profile equals batch t29, across micro-batches; short docs stamped null") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val batch = graft.queries.T29Winnowing.run(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

    // Online: the corpus plus a too-short straggler, in three micro-batches.
    val rows = docs.as[(Long, String)].collect().toSeq :+ (-1L, "tiny doc")
    val stream = MemoryStream[(Long, String)]
    val gated = EventStream.winnowGate(stream.toDF().toDF("doc_id", "text"))
    val q = gated
      .select(col("doc_id"), col("n_grams"), col("n_windows"), col("n_fp"),
        col("fp_digest"), col("density"))
      .writeStream.format("memory").queryName("winnow_gate_out")
      .outputMode("append").start()
    try {
      val thirds = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val out = spark.table("winnow_gate_out").collect()
      assert(out.length == rows.size, "the gate dropped rows")
      val profiled = out.filter(!_.isNullAt(1))
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
        .toMap
      assert(profiled.keySet == batch.keySet,
        "gate profiled a different doc set than batch t29")
      val diffs = batch.collect { case (id, bv) if profiled(id) != bv => id }
      assert(diffs.isEmpty, s"${diffs.size} docs diverged; first: ${diffs.headOption}")
      // the straggler survived with a null profile (stamped, not dropped)
      val short = out.find(_.getLong(0) == -1L).get
      assert(short.isNullAt(1) && short.isNullAt(3) && short.isNullAt(4),
        "too-short doc was not stamped null")
    } finally q.stop()
    spark.catalog.clearCache()
  }
}
