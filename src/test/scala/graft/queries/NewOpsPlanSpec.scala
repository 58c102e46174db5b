package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape pins for the round-7 operators — the same discipline as
  * PlanSpec: the property that makes each plan survive a 100× scale-up is
  * asserted, so a refactor can't silently regress it.
  */
class NewOpsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: GraftQuery): String = {
    val p = q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    p
  }

  test("d17/t18: shingle self-joins stay key joins — no cartesian, no nested loop") {
    for (q <- Seq(D17Containment, T18SourceOverlap)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} pair generation degenerated to O(n^2):\n$p")
    }
  }

  test("g3/g4: the full bucketed-pairs + graph chain contains no O(n^2) join") {
    // g3 (PageRank) has no cross at all; g4's census keeps exactly one
    // BroadcastNestedLoopJoin — the final 1-row stats × 1-row triangle
    // count cross (bounded by construction, same as g2's pinned shape).
    val p3 = plan(G3PageRankLsh)
    assert(!p3.contains("CartesianProduct") && !p3.contains("BroadcastNestedLoopJoin"),
      s"g3 has a non-keyed join:\n$p3")
    val p4 = plan(G4TrianglesLsh)
    assert(!p4.contains("CartesianProduct"), s"g4 has a cartesian:\n$p4")
    val bnlj = p4.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj == 1, s"g4 should have exactly the 1-row census cross, got $bnlj:\n$p4")
  }

  test("t19: every window is partition-local (rank never funnels through one task)") {
    val p = plan(T19LmFilter)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the rank window in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("__pid"),
        s"unpartitioned window (single-partition global sort at scale): $l")
    }
  }

  test("s10: shortlist stage is TakeOrdered (no global sort), query side broadcast") {
    // run()'s output is the driver greedy fold (a LocalTableScan by
    // design — the A4 master-fold budget); the distributed phase to pin is
    // the shortlist stage itself.
    val p = S10MmrSelect.shortlistFrame(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"shortlist materializes a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row query side not broadcast:\n$p")
  }

  test("p6: quota fill windows by source, weight/total joins broadcast") {
    val p = plan(P6TemperatureMix)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("source")),
      s"per-source rank window not keyed on source:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"weights join not broadcast:\n$p")
  }
}
