package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.{K4QualityClassifier, K5ClassifierEval, K7UncertaintySample}

/** k7's edge twin: EventStream.uncertaintyGate under batch-trained weights
  * and k5's PUBLISHED argmax-F1 threshold must stamp every arriving doc
  * with the exact uncertainty key the batch k7 query computes — so a
  * monitor TakeOrdering the stamped sink publishes the identical
  * annotation queue. The gate reads k4's score expression and k7's key
  * expression (one definition, two surfaces); this spec catches a
  * re-derivation (skew) or accidental statefulness.
  */
class UncertaintyGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed uncertainty keys equal batch k7's; top-n over the sink IS the batch queue") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Offline: train k4, publish k5's operating threshold (its own sweep).
    val f = K4QualityClassifier.features(spark, TestSpark.sf0001).cache()
    val w = K4QualityClassifier.trainedWeights(f)
    f.unpersist()
    val thr = K5ClassifierEval.run(spark, TestSpark.sf0001)
      .orderBy(col("f1").desc, col("threshold").asc).limit(1)
      .collect()(0).getAs[Double]("threshold")
    val batchQueue = K7UncertaintySample.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq

    // Online: same docs arrive SHUFFLED across three micro-batches.
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .sortBy { case (id, _) => (id * 2654435761L) % 1000003L }.toSeq
    val stream = MemoryStream[(Long, String)]
    val gated = EventStream.uncertaintyGate(
      stream.toDF().toDF("doc_id", "text"), w, thr)
    val q = gated.select(col("doc_id"), col("score"), col("thr"), col("uncert_e6"))
      .writeStream.format("memory").queryName("k7_gate_out")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { part =>
        stream.addData(part); q.processAllAvailable()
      }
      val sink = spark.table("k7_gate_out")
      // per-row key parity with the batch projection (pre-limit)
      val batchKeys = K4QualityClassifier.run(spark, TestSpark.sf0001)
        .select(col("doc_id"),
          K7UncertaintySample.uncertCol(col("score"), lit(thr)).as("u"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val streamedKeys = sink.collect().map(r => (r.getLong(0), r.getLong(3))).toMap
      assert(streamedKeys.size == batchKeys.size)
      val diffs = batchKeys.collect {
        case (id, k) if streamedKeys(id) != k => (id, k, streamedKeys(id))
      }
      assert(diffs.isEmpty, s"${diffs.size} keys differ; first: ${diffs.headOption}")
      // the monitor's TakeOrdered over the sink IS the batch annotation queue
      val monitorQueue = sink
        .orderBy(col("uncert_e6").asc, col("doc_id").asc).limit(100)
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
      assert(monitorQueue == batchQueue,
        s"monitor queue diverged from batch k7; first diff: " +
          s"${monitorQueue.zip(batchQueue).find(p => p._1 != p._2)}")
    } finally q.stop()
  }
}
