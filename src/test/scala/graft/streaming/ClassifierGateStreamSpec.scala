package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.K4QualityClassifier

/** Train-offline/serve-online parity for k4: the batch-trained weights,
  * applied by EventStream.classifierGate to the same documents arriving as
  * a stream, must reproduce the batch query's scores row for row. The gate
  * reads k4's OWN feature/score expressions, so this is a structural
  * guarantee — the spec exists to catch someone re-deriving the features in
  * the gate (training/serving skew) or making the gate stateful by
  * accident.
  */
class ClassifierGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed classifier scores equal the batch query's, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Offline: train on the batch path (the k4 query's own loop).
    val f = K4QualityClassifier.features(spark, TestSpark.sf0001).cache()
    val w = K4QualityClassifier.trainedWeights(f)
    f.unpersist()
    val batch = K4QualityClassifier.run(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("score"), col("pred_ref")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap

    // Online: the same docs arrive in two micro-batches.
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val stream = MemoryStream[(Long, String)]
    val gated = EventStream.classifierGate(
      stream.toDF().toDF("doc_id", "text"), w)
    val q = gated.select(col("doc_id"), col("score"), col("pred_ref"))
      .writeStream.format("memory").queryName("k4_gate_out")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      val out = spark.table("k4_gate_out").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
      assert(out.size == batch.size, s"row count ${out.size} != batch ${batch.size}")
      val diffs = batch.collect {
        case (id, bv) if out(id) != bv => (id, bv, out(id))
      }
      assert(diffs.isEmpty,
        s"${diffs.size} docs scored differently; first: ${diffs.headOption}")
    } finally q.stop()
  }
}
