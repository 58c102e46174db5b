package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.QuotaStream._

/** Pins the streaming quota gate's contract against batch p3: once the
  * stream has carried at least quota docs of a source, the admitted count
  * per source equals exactly the batch quota — across micro-batches, with
  * over-quota arrivals dropped and later arrivals of a filled source
  * admitting nothing.
  */
class QuotaStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming admission fills each source's quota exactly, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Quotas = batch p3's per-source quotas on the same corpus.
    val quotas = graft.queries.P3MixtureSample.run(spark, TestSpark.sf0001)
      .select("source", "quota").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "source").collect()
      .map(r => DocArrival(r.getLong(0), r.getString(1))).toSeq

    val stream = MemoryStream[DocArrival]
    val q = quotaAdmission(stream.toDS(), quotas).writeStream
      .format("memory").queryName("quota_out").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.size / 2)
      stream.addData(a); q.processAllAvailable()
      stream.addData(b); q.processAllAvailable()
      // Replay the first half: every source is already full — nothing admits.
      stream.addData(a); q.processAllAvailable()
      val admitted = spark.table("quota_out").as[DocArrival].collect()
      val bySource = admitted.groupBy(_.source).view.mapValues(_.length.toLong).toMap
      for ((src, quota) <- quotas)
        assert(bySource.getOrElse(src, 0L) == quota,
          s"$src admitted ${bySource.getOrElse(src, 0L)}, quota $quota")
      assert(admitted.map(_.doc_id).distinct.length == admitted.length,
        "a document was admitted twice")
      // Total matches batch p3's kept-set size.
      val batchKept = graft.queries.P3MixtureSample.run(spark, TestSpark.sf0001).count()
      assert(admitted.length.toLong == batchKept)
    } finally q.stop()
  }
}
