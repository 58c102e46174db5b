package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** p13's routing at the edge: EventStream.splitGate over documents arriving
  * in arbitrary micro-batches (here: deliberately SHUFFLED arrival order)
  * must stamp every doc with exactly the split the batch manifest assigns —
  * the verdict is a pure function of doc_id, so arrival order, batch
  * boundaries, and what else has arrived are all irrelevant. That
  * edge-routability is the operational payoff of the hash-threshold design
  * (a rank-based mechanism cannot run statelessly at the edge at all).
  */
class SplitGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed split routing equals the batch assignment under shuffled arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("source"), col("text"))
    val batch = graft.queries.P13SplitManifest
      .run(spark, TestSpark.sf0001) // manifest level
    val batchAssign = docs
      .withColumn("split", graft.queries.P13SplitManifest.splitCol(col("doc_id")))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap

    // shuffled arrival: reverse-sorted by a salt of the id
    val arrival = docs.select(col("doc_id")).as[Long].collect()
      .sortBy(id => (id * 2654435761L) % 1000003L)
    val stream = MemoryStream[Long]
    val gated = EventStream.splitGate(stream.toDF().toDF("doc_id"))
    val q = gated.writeStream.format("memory").queryName("split_gate")
      .outputMode("append").start()
    try {
      arrival.grouped(math.max(1, arrival.length / 4 + 1)).foreach { part =>
        stream.addData(part.toSeq); q.processAllAvailable()
      }
      val streamed = spark.table("split_gate").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed.keySet == batchAssign.keySet)
      streamed.foreach { case (id, s) =>
        assert(batchAssign(id) == s, s"doc $id routed to $s but batch assigns ${batchAssign(id)}")
      }
      // and the manifest's per-split totals agree with the gate's routing
      val gateCounts = streamed.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val manifestCounts = batch.groupBy("split").agg(sum("n_docs").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gateCounts == manifestCounts,
        s"gate totals $gateCounts != manifest totals $manifestCounts")
    } finally q.stop()
  }
}
