package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class NearDedupStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("streaming near-dedup drops identical-signature docs across batches, keeps distinct ones") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val a = "the quick brown fox jumps over the lazy dog again and again tonight"
    val aDup = a // identical text → identical signature
    val b = "completely different content about spark catalyst optimizer internals and shuffles"
    val c = "a third unrelated document mentioning minhash signatures and streaming state"

    val stream = MemoryStream[Doc]
    val q = EventStream.nearDedupStream(stream.toDF(), "ts", "text")
      .writeStream.format("memory").queryName("near_dedup_out").outputMode("append").start()
    try {
      stream.addData(Seq(Doc(1, new Timestamp(t0), a), Doc(2, new Timestamp(t0 + 1000), b)))
      q.processAllAvailable()
      // Cross-batch duplicate of doc 1's content + one new doc.
      stream.addData(Seq(Doc(3, new Timestamp(t0 + 2000), aDup), Doc(4, new Timestamp(t0 + 3000), c)))
      q.processAllAvailable()
      val ids = spark.table("near_dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 2L, 4L), s"got $ids — doc 3 (duplicate content) should be dropped")
    } finally q.stop()
  }

  test("distinct SHORT docs (no shingles) are not treated as duplicates of each other") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val stream = MemoryStream[Doc]
    val q = EventStream.nearDedupStream(stream.toDF(), "ts", "text")
      .writeStream.format("memory").queryName("short_dedup_out").outputMode("append").start()
    try {
      // All three have <3 tokens → zero shingles; 10 and 12 share content.
      stream.addData(Seq(
        Doc(10, new Timestamp(t0), "hello world"),
        Doc(11, new Timestamp(t0 + 1000), "buy now"),
        Doc(12, new Timestamp(t0 + 2000), "hello world")))
      q.processAllAvailable()
      val ids = spark.table("short_dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(10L, 11L),
        s"got $ids — distinct short docs must both survive; exact dup must drop")
    } finally q.stop()
  }
}
