package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Direct unit pins for the delta-propagation rewrite of
  * [[ConnectedComponents.minLabel]] (round 14) — the engine is otherwise
  * covered only through its eight oracle consumers, which exercise the
  * shallow-cluster regime. These fixtures force the regimes the corpus
  * doesn't: long chains (pointer-jumping + delta convergence), bridges
  * that merge two locally-converged cliques late, the round cap's partial
  * output, and the empty/self-loop edges of the input contract.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def components(pairs: Seq[(Long, Long)], maxRounds: Int = 50): Map[Long, Long] = {
    import spark.implicits._
    val out = ConnectedComponents.minLabel(
      spark, pairs.toDF("a", "b"), edgePartitions = 4, maxRounds = maxRounds,
      name = "cc-spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.catalog.clearCache()
    out
  }

  test("a 64-node chain collapses to one component under the 50-round cap (delta + pointer jumping)") {
    // Worst case for pure min-propagation: a path graph needs O(diameter)
    // rounds without jumping. 63 edges, diameter 63 — the default cap only
    // suffices because chase halves the remaining path length per round.
    val chain = (1L until 64L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.keySet == (1L to 64L).toSet)
    assert(got.values.toSet == Set(1L), s"chain split into ${got.values.toSet}")
  }

  test("two cliques converge locally, then a bridge merges them (late cross-delta propagation)") {
    // {1..5} complete, {101..105} complete, plus one bridge 5-101. The
    // high clique converges to label 101 in round 1; the bridge then has
    // to re-open it with label 1 — the regime where a delta engine that
    // forgets "unchanged" neighbors would stall.
    val cliqueA = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val cliqueB = for (i <- 101L to 105L; j <- (i + 1) to 105L) yield (i, j)
    val got = components(cliqueA ++ cliqueB :+ (5L, 101L))
    assert(got.values.toSet == Set(1L))
    assert(got.size == 10)
  }

  test("disjoint components keep distinct minima; labels are component-internal node ids") {
    val got = components(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 30L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("self-loops and duplicate edges are harmless; empty input yields an empty frame") {
    val got = components(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
    assert(components(Seq.empty).isEmpty)
  }

  test("round cap: a chain under an insufficient cap reports PARTIAL labels, never wrong membership") {
    // 32-node chain, cap 2: must NOT converge to one label, but every
    // label must still be a node id <= the node's own id within the chain
    // (labels only ever decrease from the seed, and only along edges).
    val chain = (1L until 32L).map(i => (i, i + 1))
    val got = components(chain, maxRounds = 2)
    assert(got.keySet == (1L to 32L).toSet)
    assert(got.values.toSet.size > 1, "cap=2 cannot close a 31-diameter chain")
    got.foreach { case (n, l) => assert(l <= n && l >= 1L) }
    // and the same chain converges exactly when given room
    assert(components(chain).values.toSet == Set(1L))
  }
}
