package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.T8Repetition

/** The streaming quality gate must agree with batch t8 column-for-column —
  * the per-row sorted-run bigram mode vs the explode+groupBy mode are two
  * implementations of one spec, and t8's DuckDB gate transfers to the
  * stream exactly as far as this equivalence holds.
  */
class StreamingQualityGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tok", "dup_word_frac", "top_bigram_frac", "flagged")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
      .toMap

  test("batch: qualityGate equals t8 on every document") {
    val gate = asMap(EventStream.qualityGate(
      Tables.documents(spark, TestSpark.sf0001).select(col("doc_id"), col("text"))))
    val t8 = asMap(T8Repetition.run(spark, TestSpark.sf0001))
    assert(gate.keySet == t8.keySet)
    for ((id, exp) <- t8)
      assert(gate(id) == exp, s"doc $id: gate ${gate(id)} vs t8 $exp")
  }

  test("streaming: the same gate runs stateless over a document stream") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).limit(50)
      .as[(Long, String)].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = EventStream.qualityGate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gate_stream").outputMode("append").start()
    try {
      stream.addData(docs)
      q.processAllAvailable()
      val got = asMap(spark.table("gate_stream"))
      val batch = asMap(EventStream.qualityGate(
        docs.toDF("doc_id", "text")))
      assert(got == batch, "stream and batch gate outputs diverge")
      assert(got.size == docs.size)
    } finally q.stop()
  }
}
