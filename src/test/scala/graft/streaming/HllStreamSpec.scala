package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.T24HllCardinality

/** Cardinality monitoring as a live stage: EventStream.hllRegisters over
  * documents arriving in arbitrary micro-batches must land on exactly the
  * (source, reg, max-rank) registers batch t24 builds — the stateful
  * grouped max IS the HLL merge, with FIXED-width state (≤512 rows per
  * source forever) — and `T24HllCardinality.estimate` over the streamed
  * snapshot must equal batch t24's published (v_zero, s_scaled, est_e9)
  * rows bit for bit.
  */
class HllStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed HLL registers equal batch t24's; estimate from them matches bit-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docsDf = Tables.documents(spark, TestSpark.sf0001).select(col("source"), col("text"))
    val docs = docsDf.as[(String, String)].collect().toSeq

    val batchRegs = T24HllCardinality.registers(docsDf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batchEst = T24HllCardinality.estimate(T24HllCardinality.registers(docsDf))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val stream = MemoryStream[(String, String)]
    val regs = EventStream.hllRegisters(stream.toDF().toDF("source", "text"))
    val q = regs.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      val thirds = docs.grouped(math.max(1, docs.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val streamed = spark.table("hll_regs").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(streamed == batchRegs, "streamed registers diverged from the batch sketch")
      // fixed-state bound: never more than 512 register rows per source
      streamed.keys.groupBy(_._1).foreach { case (src, ks) =>
        assert(ks.size <= 512, s"$src holds ${ks.size} register rows > m=512")
      }
      val estFromStream = T24HllCardinality.estimate(spark.table("hll_regs"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(estFromStream == batchEst, "estimate over streamed registers != batch t24")
    } finally q.stop()
  }
}
