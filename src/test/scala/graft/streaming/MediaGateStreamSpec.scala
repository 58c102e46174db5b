package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.Multimodal

/** Decode-at-the-edge: the multimodal decode stage is a stateless typed
  * mapPartitions, so the SAME operator (`Multimodal.extractFeatures` over
  * `decodeAvi`) runs unchanged on a payload STREAM — media frames arrive,
  * validated geometry leaves, invalid containers die at the gate (the
  * disposition drop) before any downstream stateful stage sees them. This
  * pins batch parity across micro-batches and the mixed-batch drop — the
  * multimodal front's streaming twin, same story as markup/pii/quality.
  */
class MediaGateStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed AVI decode equals the batch decode; invalid payloads drop at the gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val batch = Multimodal.pipeline(spark, Tables.documents(spark, TestSpark.sf0001))
      .collect().map(f => f.doc_id -> f).toMap

    val stream = MemoryStream[(Long, String)]
    val media = stream.toDS().map { case (id, t) =>
      // every third row carries a CORRUPT payload the gate must drop
      if (id % 3 == 2) Multimodal.MediaRecord(id, Array[Byte]('n', 'o', 'p', 'e'))
      else Multimodal.MediaRecord(id, Multimodal.aviFixturePayload(t))
    }
    val gated = Multimodal.extractFeatures(media)
    val q = gated.toDF().writeStream.format("memory").queryName("media_gate")
      .outputMode("append").start()
    try {
      val thirds = docs.grouped(math.max(1, docs.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val out = spark.table("media_gate").collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getDouble(5))).toMap
      // exactly the valid payloads survive
      assert(out.keySet == docs.map(_._1).filter(_ % 3 != 2).toSet)
      // and each surviving row equals the batch decode byte for byte
      out.foreach { case (id, (nb, w, h, nf, mb)) =>
        val b = batch(id)
        assert((nb, w, h, nf, mb) ==
          ((b.n_bytes, b.width, b.height, b.n_frames, b.mean_byte)), s"doc $id diverged")
      }
    } finally q.stop()
  }
}
