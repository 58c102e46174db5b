package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable
import graft.queries.{Q25SnapshotMerge, Q27CdcMergeFull}

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

  // applyCdc streams carry processing-time timers, so processAllAvailable()
  // never returns on them (see UpsertStream's TIMER COST note) — these
  // helpers poll the memory sink instead.
  private def awaitCount(table: String, n: Int, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (spark.table(table).count() < n) {
      if (System.currentTimeMillis > deadline)
        fail(s"sink $table never reached $n rows (has ${spark.table(table).count()})")
      Thread.sleep(50)
    }
  }
  test("q27 batch parity: a CDC stream with tombstones converges to mergeCdc's state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // q27's derivation: base = h%7 != 0 (seq 0); delta = h%3 == 0 at seq 1,
    // tombstoned when h%5 == 0 (delete events carry the before-image price,
    // the usual CDC log convention).
    val orders = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        Portable.hash60(concat(lit("snap:"), col("o_orderkey").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val base = orders.collect { case (k, c, h) if h % 7 != 0 =>
      (k, (0L, c.toDouble / 100, true, false))
    }
    val events = orders.collect { case (k, c, h) if h % 3 == 0 =>
      if (h % 5 == 0) UpsertStream.CdcEvent(k, 1L, c.toDouble / 100, deleted = true)
      else UpsertStream.CdcEvent(k, 1L, (c + c / 10).toDouble / 100, deleted = false)
    }
    // expected emissions = q27's non-carried output MINUS nothing: no-op
    // tombstones are absent from both (batch drops the row, stream emits none)
    val batch = Q27CdcMergeFull.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getString(2))).toMap
    val changed = batch.filter(_._2._2 != "carried")
    val stream = MemoryStream[UpsertStream.CdcEvent]
    val out = UpsertStream.applyCdc(stream.toDS(), base.toSeq.toDS())
    val q = out.toDF().writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    try {
      // out-of-order across batches: second half first
      val (a, b) = events.splitAt(events.length / 2)
      stream.addData(b.toSeq)
      stream.addData(a.toSeq)
      awaitCount("cdc_out", changed.size)
      val got = spark.table("cdc_out").collect()
        .map(r => r.getLong(0) -> (r.getDouble(2), r.getString(3))).toMap
      spark.catalog.clearCache()
      assert(got.keySet == changed.keySet)
      changed.foreach { case (k, (price, disp)) =>
        assert(got(k) == ((price, disp)), s"key $k: ${got(k)} != ($price, $disp)")
      }
      assert(changed.values.exists(_._2 == "deleted"), "no delete mass in the fixture")
    } finally q.stop()
  }

  test("tombstone retention: within the grace window a stale update cannot resurrect the key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UpsertStream.CdcEvent]
    val out = UpsertStream.applyCdc(
      stream.toDS(), Seq((7L, (0L, 1.0, true, false))).toDS()) // default 10-min grace
    val q = out.toDF().writeStream.format("memory").queryName("cdc_tomb")
      .outputMode("update").start()
    try {
      stream.addData(UpsertStream.CdcEvent(7L, 5L, 1.0, deleted = true))
      awaitCount("cdc_tomb", 1)
      // stale seq-3 update: loses to the seq-5 tombstone, emits NOTHING.
      // A wall-clock "row count stable for 1s" check can pass vacuously on
      // a loaded machine (the stale event's micro-batch may simply not have
      // run inside the window), so a SENTINEL key follows it: once the
      // sentinel's insert is visible the stale event has been processed —
      // whether in the same micro-batch or an earlier one.
      stream.addData(UpsertStream.CdcEvent(7L, 3L, 30.0, deleted = false))
      stream.addData(UpsertStream.CdcEvent(999L, 1L, 9.0, deleted = false))
      awaitCount("cdc_tomb", 2)
      val afterStale = spark.table("cdc_tomb").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
      assert(afterStale ==
        Set((7L, 5L, 1.0, "deleted"), (999L, 1L, 9.0, "inserted")),
        s"stale update after delete emitted: $afterStale")
      // seq-8 re-appearance: a fresh insert (the base identity died)
      stream.addData(UpsertStream.CdcEvent(7L, 8L, 80.0, deleted = false))
      awaitCount("cdc_tomb", 3)
      val rows = spark.table("cdc_tomb").collect()
        .filter(_.getLong(0) == 7L)
        .map(r => (r.getLong(1), r.getDouble(2), r.getString(3))).toSeq.sortBy(_._1)
      assert(rows == Seq((5L, 1.0, "deleted"), (8L, 80.0, "inserted")), rows.toString)
    } finally q.stop()
  }

  test("tombstone eviction: after the grace window the deleted key leaves the state store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UpsertStream.CdcEvent]
    val out = UpsertStream.applyCdc(
      stream.toDS(), Seq((7L, (0L, 1.0, true, false))).toDS(), tombstoneGraceMs = 1L)
    val q = out.toDF().writeStream.format("memory").queryName("cdc_evict")
      .outputMode("update").start()
    try {
      stream.addData(UpsertStream.CdcEvent(7L, 5L, 1.0, deleted = true))
      awaitCount("cdc_evict", 1)
      Thread.sleep(1000) // let the 1ms grace expire; self-triggered batches
                         // fire the timer and REMOVE key 7's state
      // with the tombstone evicted, even a STALE event is indistinguishable
      // from a fresh insert — the documented retention trade (delete
      // retention bounds state, not correctness-under-unbounded-lateness)
      stream.addData(UpsertStream.CdcEvent(7L, 3L, 30.0, deleted = false))
      awaitCount("cdc_evict", 2)
      val rows = spark.table("cdc_evict").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
      assert(rows.contains((7L, 3L, "inserted")),
        s"key 7 did not re-insert after eviction: $rows")
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
