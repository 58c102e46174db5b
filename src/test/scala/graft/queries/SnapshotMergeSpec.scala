package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.SnapshotMerge

/** q25 / operators.SnapshotMerge: the CDC upsert. The oracle pins the full
  * merged table; these tests pin the operator CONTRACT on a hand-built
  * fixture (delta-wins, null payloads don't fake a disposition, closed
  * 3-set) and the derived-snapshot algebra on the real corpus (disposition
  * sets partition the key universe the way the h%7 / h%3 carve-outs say
  * they must).
  */
class SnapshotMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("merge contract: delta wins, null payload values never flip a disposition") {
    import spark.implicits._
    val base = Seq(
      (1L, Option("a"), 10L),
      (2L, Option("b"), 20L),
      (3L, Option.empty[String], 30L)) // null payload in base, absent in delta
      .toDF("k", "tag", "v")
    val delta = Seq(
      (2L, Option.empty[String], 21L), // null payload in delta — must still win
      (4L, Option("d"), 40L))
      .toDF("k", "tag", "v")
    val out = SnapshotMerge.merge(base, delta, "k", Seq("tag", "v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some("a"), 10L, "carried"),
      (2L, Some("b"), 21L, "updated"), // v from delta; null delta.tag falls back to base's
      (3L, None, 30L, "carried"),      // null payload, still carried — not "inserted"
      (4L, Some("d"), 40L, "inserted")))
  }

  test("q25 dispositions partition the key universe per the carve-out algebra (sf0.001)") {
    import graft.functions.Portable
    val orders = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"),
        Portable.hash60(concat(lit("snap:"), col("o_orderkey").cast("string"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Q25SnapshotMerge.run(spark, TestSpark.sf0001)
      .select("o_orderkey", "disposition").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // every order key appears iff it is in base (h%7!=0) or delta (h%3==0)
    val expected = orders.collect {
      case (k, h) if h % 7 != 0 || h % 3 == 0 =>
        k -> (if (h % 7 == 0) "inserted" else if (h % 3 == 0) "updated" else "carried")
    }.toMap
    assert(out == expected)
    // all three dispositions populated at this scale
    assert(Set("inserted", "carried", "updated").subsetOf(out.values.toSet))
  }

  test("merge algebra: model equivalence and idempotence on seeded random snapshots") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 5) {
      val baseM = (0 until 40).map(_ => rnd.nextInt(30).toLong -> rnd.nextLong() % 1000).toMap
      val deltaM = (0 until 25).map(_ => rnd.nextInt(40).toLong -> rnd.nextLong() % 1000).toMap
      val base = baseM.toSeq.toDF("k", "v")
      val delta = deltaM.toSeq.toDF("k", "v")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
      val once = SnapshotMerge.merge(base, delta, "k", Seq("v"))
      val got = canon(once)
      // independent model: delta wins; dispositions from set membership
      val model = (baseM.keySet ++ deltaM.keySet).toSeq.sorted.map { k =>
        (k, deltaM.getOrElse(k, baseM(k)),
          if (!baseM.contains(k)) "inserted"
          else if (deltaM.contains(k)) "updated" else "carried")
      }
      assert(got == model)
      // idempotence: re-applying the same delta to the merged snapshot
      // changes values nowhere (dispositions re-derive, values fixpoint)
      val twice = canon(SnapshotMerge.merge(once.select("k", "v"), delta, "k", Seq("v")))
      assert(twice.map(t => (t._1, t._2)) == got.map(t => (t._1, t._2)),
        "re-applying the delta moved a value — merge is not idempotent on payloads")
    }
  }

  test("mergeCdc contract: tombstones, delta-sets-NULL, unset-carry, no-op delete drop") {
    import spark.implicits._
    val base = Seq(
      (1L, Option("a"), 10L),
      (2L, Option("b"), 20L),
      (3L, Option("c"), 30L),
      (5L, Option.empty[String], 50L))
      .toDF("k", "tag", "v")
    val delta = Seq(
      // set tag to NULL explicitly (tag_set=true, value null) — the case
      // coalesce would silently resurrect "b" for
      (2L, Option.empty[String], true, 21L, false),
      // tag UNSET (tag_set=false): its delta value must be IGNORED, base carries
      (3L, Option("z"), false, 31L, false),
      // tombstone for a present key: disposition deleted, last-known payload
      (5L, Option.empty[String], false, 0L, true),
      // insert with tag unset: no base to carry -> null
      (4L, Option("d"), false, 40L, false),
      // tombstone for an ABSENT key: a no-op, dropped from the output
      (9L, Option.empty[String], false, 0L, true))
      .toDF("k", "tag", "tag_set", "v", "deleted")
    val out = SnapshotMerge.mergeCdc(base, delta, "k", Seq("tag", "v"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some("a"), 10L, "carried"),
      (2L, None, 21L, "updated"),      // delta NULLED tag; v assigned (no v_set col)
      (3L, Some("c"), 31L, "updated"), // unset tag carried from base, "z" ignored
      (4L, None, 40L, "inserted"),     // unset tag on an insert -> null
      (5L, None, 50L, "deleted")))     // last-known base payload, not the delta's 0
  }

  test("reduceDelta collapses a raw CDC batch to the highest-seq row per key") {
    import spark.implicits._
    val raw = Seq(
      (1L, 3L, 30.0), (1L, 7L, 70.0), (1L, 5L, 50.0),
      (2L, 1L, 10.0),
      (3L, 9L, 90.0), (3L, 2L, 20.0))
      .toDF("k", "seq", "v")
    val got = SnapshotMerge.reduceDelta(raw, "k", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 7L, 70.0), (2L, 1L, 10.0), (3L, 9L, 90.0)))
  }

  test("q27 model equivalence: 4-set dispositions + presence semantics (sf0.001)") {
    import graft.functions.Portable
    val orders = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("c"),
        Portable.hash60(concat(lit("snap:"), col("o_orderkey").cast("string"))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = Q27CdcMergeFull.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getString(2), r.getDouble(3)))
      .toMap
    val expected = orders.flatMap { case (k, cust, c, h) =>
      val inBase = h % 7 != 0; val inDelta = h % 3 == 0; val tomb = h % 5 == 0
      if (!inBase && (!inDelta || tomb)) None // absent, or a dropped no-op delete
      else {
        val disp =
          if (!inBase) "inserted"
          else if (!inDelta) "carried"
          else if (tomb) "deleted"
          else "updated"
        val custNew = if (h % 4 == 0) None else Some(cust + 1000000L)
        val custOut =
          if (inDelta && !tomb && h % 2 == 0) custNew
          else if (inBase) Some(cust)
          else None
        val cents = if (inDelta && !tomb) c + c / 10 else c
        Some(k -> ((custOut, disp, cents.toDouble / 100)))
      }
    }.toMap
    assert(out == expected)
    // every semantic branch has corpus mass at this scale
    assert(out.values.map(_._2).toSet == Set("inserted", "carried", "updated", "deleted"))
    assert(out.exists { case (_, (cust, d, _)) => d == "updated" && cust.isEmpty },
      "no delta-sets-NULL row")
    assert(out.exists { case (_, (cust, d, _)) => d == "inserted" && cust.isEmpty },
      "no unset-column insert")
    val dropped = orders.count { case (_, _, _, h) => h % 7 == 0 && h % 3 == 0 && h % 5 == 0 }
    assert(dropped > 0, "no no-op tombstone exercised the drop branch")
  }

  test("mergeCdc idempotence: re-applying the delta to the surviving snapshot is a fixpoint") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (5L, 50L)).toDF("k", "v")
    val delta = Seq((2L, 21L, false), (5L, 0L, true), (4L, 40L, false), (9L, 0L, true))
      .toDF("k", "v", "deleted")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    val once = SnapshotMerge.mergeCdc(base, delta, "k", Seq("v"))
    val got = canon(once)
    assert(got == Seq((1L, 10L, "carried"), (2L, 21L, "updated"),
      (4L, 40L, "inserted"), (5L, 50L, "deleted")))
    // the release filter drops deleted rows; re-applying the same delta must
    // move nothing: 5's tombstone is now a no-op, 2/4 re-assign equal values
    val surviving = once.filter(col("disposition") =!= "deleted").select("k", "v")
    val twice = canon(SnapshotMerge.mergeCdc(surviving, delta, "k", Seq("v")))
    assert(twice.map(t => (t._1, t._2)) == got.filterNot(_._3 == "deleted").map(t => (t._1, t._2)),
      "re-applying the delta moved a value — mergeCdc is not idempotent on payloads")
  }

  test("checkUnique guard: an unreduced (duplicate-key) batch fails loudly, not by fan-out") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val dupDelta = Seq((2L, 21L), (2L, 22L), (3L, 30L)).toDF("k", "v")
    // without the guard the full-outer join silently fans out — the failure
    // mode the guard exists to catch
    assert(SnapshotMerge.merge(base, dupDelta, "k", Seq("v")).count() == 4)
    val ex = intercept[Exception] {
      SnapshotMerge.merge(base, dupDelta, "k", Seq("v"), checkUnique = true).count()
    }
    def msg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(msg(ex).contains("duplicate merge key"), msg(ex))
    // cdc form shares the guard
    val dupCdc = Seq((2L, 21L, false), (2L, 22L, false)).toDF("k", "v", "deleted")
    val ex2 = intercept[Exception] {
      SnapshotMerge.mergeCdc(base, dupCdc, "k", Seq("v"), checkUnique = true).count()
    }
    assert(msg(ex2).contains("duplicate merge key"), msg(ex2))
    // unique inputs pass the guard unchanged
    val clean = SnapshotMerge.merge(
      base, Seq((2L, 21L), (3L, 30L)).toDF("k", "v"), "k", Seq("v"),
      checkUnique = true)
    assert(clean.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq ==
      Seq((1L, 10L, "carried"), (2L, 21L, "updated"), (3L, 30L, "inserted")))
  }

  test("checkUnique guard: multiple NULL-keyed rows PASS — NULLs never match the equi-join") {
    import spark.implicits._
    // NULL keys can't fan out (the join never matches them), so the guard
    // must not reject an input the merge itself handles.
    val base = Seq((Some(1L), 10L), (None, 97L), (None, 98L)).toDF("k", "v")
    val delta = Seq((Some(1L), 11L), (None, 99L)).toDF("k", "v")
    val got = SnapshotMerge.merge(base, delta, "k", Seq("v"), checkUnique = true)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    // each NULL row survives independently: 2 carried from base, 1 inserted
    assert(got == Seq((-1L, 97L), (-1L, 98L), (-1L, 99L), (1L, 11L)), got.toString)
  }

  test("updated/inserted rows carry the exact +10% integer-cents price") {
    val rows = Q25SnapshotMerge.run(spark, TestSpark.sf0001).collect()
    val orig = graft.Tables.orders(spark, TestSpark.sf0001)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (k, disp, price) = (r.getLong(0), r.getString(2), r.getDouble(3))
      val c = orig(k)
      val want = disp match {
        case "carried" => c
        case _         => c + c / 10 // inserted + updated both price off the delta
      }
      assert(price == want.toDouble / 100, s"key $k ($disp)")
    }
  }
}
