package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape pins for the round-12 queries (NewOpsPlanSpec's discipline:
  * the property that makes each plan survive a 100× scale-up is asserted,
  * so a refactor can't silently regress it).
  */
class Round12PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: GraftQuery): String = {
    val p = q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    p
  }

  test("w11: per-type stats reach the daily frame as a BROADCAST — no shuffled self-join") {
    // The stats side is types-bounded; shuffling the daily frame against it
    // would re-exchange data that is already grouped.
    val p = plan(W11VolumeAnomaly)
    assert(p.contains("BroadcastHashJoin"), s"w11 stats join is not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"w11 acquired a shuffled/cartesian join:\n$p")
  }

  test("d19: provenance is keyed equi-joins + one bounded aggregate — no cartesian") {
    val p = plan(D19DupProvenance)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d19 degenerated to a non-keyed join:\n$p")
  }

  test("p17: byte prefix sums stay __pid-local — no single-partition global window") {
    val p = plan(P17ShardManifest)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the prefix-sum window in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("pid"),
        s"unpartitioned window (single-partition byte cumsum at scale): $l")
    }
  }

  test("t28: novelty joins are doc_id/hash-keyed — no cartesian, no nested loop") {
    val p = plan(T28GramNovelty)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"t28 degenerated to a non-keyed join:\n$p")
  }

  test("g5: the degree census is two aggregates over the pair frame — no join at all") {
    val p = plan(G5DegreeCensus)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"g5 has a non-keyed join:\n$p")
    // the pair GENERATION (d16's chain) contains keyed joins; the census on
    // top must add none — count the aggregates instead: at least the two
    // census HashAggregate pairs exist
    assert(p.contains("HashAggregate"), s"g5 lost its aggregates:\n$p")
  }

  test("m9: one doc_id-keyed fingerprint join + composite-keyed rejoin — nothing quadratic") {
    val p = plan(M9AvDedup)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m9 degenerated to a non-keyed join:\n$p")
    assert(!p.contains("Window"), s"m9 must not use a full-partition survivor window:\n$p")
  }

  test("v5: the purity window partitions by component — never an unpartitioned rank") {
    val p = plan(V5ClusterPurity)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the per-component windows in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("component"),
        s"v5 window not component-partitioned (global sort at scale): $l")
    }
  }
}
