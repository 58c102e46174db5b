package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Rank.globalRowNumber must (a) be the exact global row_number under the
  * given total order and (b) stay codegen-safe at thousands of range
  * partitions: the per-partition offsets travel via a broadcast hash join,
  * never an O(P)-deep when(__pid===…) chain whose expression tree trips the
  * 64KB generated-method limit and silently falls back to interpreted mode.
  */
class RankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(n: Int) = {
    import spark.implicits._
    // Deliberate key ties so the id tie-break carries the total order.
    (0 until n).map(i => (((i * 31) % 97).toLong, i.toLong)).toDF("k", "id")
  }

  test("globalRowNumber == sequential rank under (k, id), parts = 8") {
    val df = fixture(1000)
    val got = Rank.globalRowNumber(df, Seq(col("k"), col("id")), parts = 8)
      .select("k", "id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val want = got.map(t => (t._1, t._2)).sortBy(identity).toSeq
    assert(got.map(_._3).toSeq == (1L to 1000L), "rk not 1..n")
    assert(got.map(t => (t._1, t._2)).toSeq == want,
      "rk order diverged from the (k, id) total order")
  }

  test("parts = 2048 stays correct with no O(P) when-chain in the plan") {
    val df = fixture(5000)
    val ranked = Rank.globalRowNumber(df, Seq(col("k"), col("id")), parts = 2048)
    val got = ranked.select("k", "id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    assert(got.map(_._3).toSeq == (1L to 5000L), "rk not 1..n")
    assert(got.map(t => (t._1, t._2)).toSeq ==
      got.map(t => (t._1, t._2)).sortBy(identity).toSeq,
      "rk order diverged from the (k, id) total order at parts=2048")
    // The offsets must be a join, not a 2048-branch CASE WHEN cascade.
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("CASE WHEN (__pid"),
      "offset when-chain resurfaced — codegen blowup risk at large P")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast hash join for the (pid, offset) frame; plan:\n$plan")
  }
}
