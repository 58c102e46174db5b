package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable
import graft.queries.Q25SnapshotMerge

/** Streaming CDC apply vs batch merge: q25's delta batch replayed as an
  * out-of-order update stream against the bootstrapped base snapshot must
  * converge to exactly the batch merge's final state — same values, same
  * inserted/updated dispositions, carried keys untouched.
  */
class UpsertStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("replayed delta stream converges to the batch SnapshotMerge state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // q25's derivation: base = h%7 != 0 at original cents (seq 0), delta =
    // h%3 == 0 at +10% cents (seq 1).
    val orders = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        Portable.hash60(concat(lit("snap:"), col("o_orderkey").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = orders.collect { case (k, c, h) if h % 7 != 0 =>
      (k, (0L, c.toDouble / 100, true))
    }
    val deltas = orders.collect { case (k, c, h) if h % 3 == 0 =>
      UpsertStream.Upsert(k, 1L, (c + c / 10).toDouble / 100)
    }

    val stream = MemoryStream[UpsertStream.Upsert]
    val out = UpsertStream.upsertLatest(stream.toDS(), base.toSeq.toDS())
    val q = out.toDF().writeStream.format("memory").queryName("upsert_out")
      .outputMode("update").start()
    try {
      // out-of-order across batches: second half first
      val (a, b) = deltas.splitAt(deltas.length / 2)
      stream.addData(b.toSeq); q.processAllAvailable()
      stream.addData(a.toSeq); q.processAllAvailable()
      val got = spark.table("upsert_out").collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
      val batch = Q25SnapshotMerge.run(spark, TestSpark.sf0001).collect()
        .map(r => r.getLong(0) -> (r.getDouble(3), r.getString(2))).toMap
      spark.catalog.clearCache()
      // every non-carried batch row appears with the same value+disposition
      val changed = batch.filter(_._2._2 != "carried")
      assert(got.keySet == changed.keySet)
      changed.foreach { case (k, (price, disp)) =>
        assert(got(k) == ((price, disp)), s"key $k: ${got(k)} != ($price, $disp)")
      }
    } finally q.stop()
  }

  test("per-key ordering: a stale (lower-seq) update arriving later never wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UpsertStream.Upsert]
    val out = UpsertStream.upsertLatest(
      stream.toDS(), Seq((7L, (0L, 1.0, true))).toDS())
    val q = out.toDF().writeStream.format("memory").queryName("upsert_ooo")
      .outputMode("update").start()
    try {
      stream.addData(UpsertStream.Upsert(7L, 5L, 50.0)); q.processAllAvailable()
      stream.addData(UpsertStream.Upsert(7L, 3L, 30.0)); q.processAllAvailable()
      val rows = spark.table("upsert_ooo").collect()
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      // second batch re-emits the UNCHANGED winner (seq 5), never seq 3
      assert(rows.forall(_ == ((5L, 50.0))), rows.toString)
    } finally q.stop()
  }
}
