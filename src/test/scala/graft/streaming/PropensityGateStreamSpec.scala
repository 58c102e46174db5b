package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.{K4QualityClassifier, S12PropensitySample}

/** s12's edge twin: EventStream.propensityGate must stamp each arriving
  * doc with the exact Efraimidis-Spirakis key the batch sample computes —
  * and because A-ES keys are pure per-doc functions, the n smallest keys
  * over ANY arrived prefix are exactly the batch sample of that prefix
  * (the reservoir property). Both claims pinned under shuffled arrival.
  */
class PropensityGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed A-ES keys equal batch s12's; top-n over the sink IS the batch sample") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val f = K4QualityClassifier.features(spark, TestSpark.sf0001).cache()
    val w = K4QualityClassifier.trainedWeights(f)
    f.unpersist()
    val batchSample = S12PropensitySample.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val batchKeys = K4QualityClassifier.run(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        S12PropensitySample.keyE6(
          S12PropensitySample.negLnUE6(col("doc_id")), col("score")).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy { case (id, _) => (id * 1099511628211L) % 1000033L }.toSeq
    val stream = MemoryStream[(Long, String)]
    val gated = EventStream.propensityGate(stream.toDF().toDF("doc_id", "text"), w)
    val q = gated.select(col("doc_id"), col("score"), col("key_e6"))
      .writeStream.format("memory").queryName("s12_gate_out")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { part =>
        stream.addData(part); q.processAllAvailable()
      }
      val sink = spark.table("s12_gate_out")
      val streamedKeys = sink.collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(streamedKeys.size == batchKeys.size)
      val diffs = batchKeys.collect {
        case (id, k) if streamedKeys(id) != k => (id, k, streamedKeys(id))
      }
      assert(diffs.isEmpty, s"${diffs.size} keys differ; first: ${diffs.headOption}")
      // full-population top-n over the sink == the declared batch sample
      val monitorSample = sink
        .orderBy(col("key_e6").asc, col("doc_id").asc).limit(200)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      assert(monitorSample == batchSample,
        s"monitor sample diverged; first diff: " +
          s"${monitorSample.zip(batchSample).find(p => p._1 != p._2)}")
      // reservoir property: the batch A-ES of the FIRST micro-batch alone
      // equals the top-n over only that prefix's stamped rows
      val prefix = docs.take(math.max(1, docs.size / 3 + 1))
      val prefixIds = prefix.map(_._1).toSet
      val prefixTop = sink.filter(col("doc_id").isInCollection(prefixIds))
        .orderBy(col("key_e6").asc, col("doc_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSeq
      val prefixBatch = S12PropensitySample.sampleOn(
        K4QualityClassifier.run(spark, TestSpark.sf0001)
          .filter(col("doc_id").isInCollection(prefixIds))
          .select(col("doc_id"), col("score")), 10)
        .collect().map(_.getLong(0)).toSeq
      assert(prefixTop == prefixBatch,
        "prefix top-n diverged from the batch A-ES of the same prefix")
    } finally q.stop()
  }
}
