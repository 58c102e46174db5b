package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.T23CorpusDrift

/** Drift monitoring as a live stage: EventStream.driftCounts over documents
  * arriving in arbitrary micro-batches must land on exactly the token
  * counts batch t23 aggregates — stateful grouped aggregation IS the count
  * merge (the t15 streamed-sketch argument) — and the JS divergence
  * computed from the streamed counts must equal t23's published js_e9.
  */
class DriftStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed drift counts equal the batch aggregate; JS from them equals t23's") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextOps

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select((expr("CAST(substr(source, 4) AS INT)") % 2).as("grp"), col("text"))
      .as[(Int, String)].collect().toSeq

    // batch truth: the same count stage t23 runs
    val batchCounts = Tables.documents(spark, TestSpark.sf0001)
      .select((expr("CAST(substr(source, 4) AS INT)") % 2).as("grp"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cnt_b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    val stream = MemoryStream[(Int, String)]
    val counts = EventStream.driftCounts(stream.toDF().toDF("grp", "text"))
    val q = counts.writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    try {
      val thirds = docs.grouped(math.max(1, docs.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val streamed = spark.table("drift_counts").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batchCounts)
      // JS recomputed from the streamed counts == t23's published divergence
      val nA = streamed.values.map(_._1).sum
      val nB = streamed.values.map(_._2).sum
      val v = streamed.size.toLong
      val js = streamed.values.map { case (ca, cb) =>
        val p = (ca + 1).toDouble / (nA + v)
        val qq = (cb + 1).toDouble / (nB + v)
        val m = (p + qq) / 2
        math.round((0.5 * p * math.log(p / m) + 0.5 * qq * math.log(qq / m)) * 1e9)
      }.sum
      val published = T23CorpusDrift.run(spark, TestSpark.sf0001)
        .select("js_e9").collect()(0).getLong(0)
      assert(js == published, s"streamed-counts JS $js != batch t23 $published")
    } finally q.stop()
  }
}
