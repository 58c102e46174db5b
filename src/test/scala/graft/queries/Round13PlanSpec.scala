package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape pins for the round-13 queries (the Round12PlanSpec
  * discipline: the property that makes each plan survive a 100× scale-up
  * is asserted, so a refactor can't silently regress it).
  */
class Round13PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: GraftQuery): String = {
    val p = q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    p
  }

  test("t29: the winnow minima are executor-local — NO window operator at all (round-14 strengthening)") {
    // Round 13 pinned "window partitioned by doc_id"; round 14 removed the
    // window entirely (per-row slice/array_min combinators — winnowing is
    // per-document, so no shuffle is ever needed for the minima). A
    // windowspecdefinition reappearing here is the corpus-wide gram shuffle
    // coming back.
    val p = plan(T29Winnowing)
    assert(!p.contains("windowspecdefinition"),
      s"t29 reacquired a SQL window — the minima should be per-row array work:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"t29 acquired a non-keyed join:\n$p")
  }

  test("d20: pair candidates come from the fp-keyed equi-join — no cartesian, no window") {
    val p = plan(D20WinnowDup)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d20 degenerated to a non-keyed join:\n$p")
    // the pair frame is groupBy-collapsed, never a full-partition survivor
    // window; the only windows belong to the winnow stage itself (doc_id)
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("doc_id"), s"d20 acquired a non-doc window: $l")
    }
  }

  test("s14: banded candidates are (band,key)-keyed; top-k windows per probe") {
    val p = plan(S14AnnHamming)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"s14 degenerated to a non-keyed join (all-pairs at scale):\n$p")
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the per-probe rank window in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("probe_id"),
        s"s14 rank window not probe-partitioned (global sort at scale): $l")
    }
  }

  test("v6: propagation rounds are keyed joins; the argmax window partitions per node") {
    val p = plan(V6LabelPropagation)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"v6 degenerated to a non-keyed join:\n$p")
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the per-node argmax windows in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("vec_id"),
        s"v6 argmax window not node-partitioned (global sort at scale): $l")
    }
  }

  test("d21: components ride keyed joins over the d20 pair stage — no cartesian") {
    val p = plan(D21WinnowClusters)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d21 degenerated to a non-keyed join:\n$p")
  }

  test("p18: the curriculum position rides Rank.globalRowNumber — __pid-local windows only") {
    val p = plan(P18Curriculum)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the range-partitioned rank window in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("pid"),
        s"unpartitioned window (single-partition global sort at scale): $l")
    }
    assert(p.contains("BroadcastHashJoin"),
      s"p18's O(P) offsets must arrive as a broadcast join:\n$p")
  }
}
