package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("matches latest right row at-or-before, per key, including exact ties") {
    val left = Seq(
      (1L, ts(100), "l1"), (1L, ts(200), "l2"), (1L, ts(50), "l0"),
      (2L, ts(100), "l3")).toDF("k", "ts", "lid")
    val right = Seq(
      (1L, ts(80), 8.0), (1L, ts(200), 20.0), // tie at 200 with l2
      (2L, ts(150), 15.0) // after l3 — no match
    ).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"))
      .select(col("lid"), col("asof_v"))
      .collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got("l0").isEmpty, "no right row at or before t=50")
    assert(got("l1").contains(8.0))
    assert(got("l2").contains(20.0), "tie at equal timestamps must match (>= semantics)")
    assert(got("l3").isEmpty, "right row is strictly after")
  }

  test("nullable right columns never stitch values from different right rows") {
    val left = Seq((1L, ts(10), "L")).toDF("k", "ts", "lid")
    // r2 is the as-of match; its `b` is null. A per-column carry would leak
    // r1's b=7 alongside r2's a=1 — a row that never existed.
    val right = Seq(
      (1L, ts(3), Some(2.0), Some(7.0)),
      (1L, ts(5), Some(1.0), Option.empty[Double])).toDF("k", "ts", "a", "b")
    val row = AsOfJoin.asOf(left, right, "k", "ts", Seq("a", "b")).collect().head
    assert(row.getAs[Double]("asof_a") == 1.0)
    assert(row.isNullAt(row.fieldIndex("asof_b")),
      s"stitched value from an older right row: $row")
  }

  test("left rows and columns are preserved") {
    val left = Seq((1L, ts(10), "a", 42)).toDF("k", "ts", "name", "extra")
    val right = Seq((1L, ts(5), 1.5)).toDF("k", "ts", "v")
    val row = AsOfJoin.asOf(left, right, "k", "ts", Seq("v")).collect().head
    val asMap = row.getValuesMap[Any](Seq("k", "name", "extra", "asof_v"))
    assert(asMap("name") == "a" && asMap("extra") == 42 && asMap("asof_v") == 1.5)
  }

  test("events data has no (user, ts) purchase collisions (j3 determinism precondition)") {
    val dups = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).count()
      .filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("plan: one shuffle (union + single window), no join node") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val clicks = ev.filter(col("event_type") === "click").select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("ts"), col("value"))
    val p = AsOfJoin.asOf(clicks, purchases, "user_id", "ts", Seq("value"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of should not plan a join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges")
  }
}
