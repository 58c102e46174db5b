package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Makes d16's crossover claim EXECUTABLE (it lived in scaladoc prose
  * through round 10): at test scale 4-plane tables probe 11/16 buckets and
  * the candidate set approaches all-pairs — the documented reason d16
  * benches slower than the exact d5 at sf0.1 — and the fix is the plane
  * count, a config knob, not code. Two pins:
  *
  *   (a) candidate count falls SUPERLINEARLY with the plane count (the
  *       bucket population math: 2^planes buckets, radius-r probing visits
  *       a vanishing fraction of them), measured through the real
  *       candidate stage at 4 → 8 → 16 planes;
  *   (b) the 0.90 recall floors hold at 8 planes x 6 tables x radius 3 —
  *       since round 12 this IS the declared operating point (the measured
  *       sf1-probe optimum), so (b) double-checks the promotion with
  *       EXPLICIT knobs while SemanticLshRecallSpec checks the declared
  *       defaults; planes bound the bucket population, tables and probe
  *       radius buy the recall back.
  *
  * Both run the DECLARED chain with explicit knobs
  * ([[D16SemanticLshClusters.verifiedPairsWith]]) — the experiment
  * exercises the production operator, not a model of it.
  */
class D16CrossoverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sweep(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

  test("(a) candidate count falls superlinearly with plane count (sf0.01)") {
    import D16SemanticLshClusters._
    def cands(nPlanes: Int): Long = {
      val c = candidatePairsWith(spark, TestSpark.sf001,
        tablesFor(nPlanes, 3), probeMasksFor(nPlanes, 2)).count()
      sweep(); c
    }
    val c4 = cands(4); val c8 = cands(8); val c16 = cands(16)
    info(s"candidates at 3 tables, radius 2: 4 planes=$c4, 8 planes=$c8, 16 planes=$c16")
    assert(c4 > 0 && c8 > 0, "vacuous fixture")
    // Superlinear: each plane-count doubling must MORE than halve the
    // candidate set (the underlying curve is exponential — 2^planes
    // buckets — so /2 per doubling is a conservative floor).
    assert(c8 < c4 / 2.0, s"8-plane candidates $c8 not < half of 4-plane $c4")
    assert(c16 < c8 / 2.0, s"16-plane candidates $c16 not < half of 8-plane $c8")
    assert(c16 < c4 / 8.0, s"16-plane candidates $c16 not superlinear vs 4-plane $c4")
  }

  test("(b) recall floors hold at the widened config: 8 planes x 6 tables x radius 3 (sf0.01)") {
    import D16SemanticLshClusters._
    val widened = verifiedPairsWith(spark, TestSpark.sf001,
      tablesFor(8, 6), probeMasksFor(8, 3))
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sweep()
    val exactPairs = D5EmbedDedup.run(spark, TestSpark.sf001)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    sweep()
    assert(exactPairs.nonEmpty, "no exact pairs — the fixture is vacuous")
    // precision 1.0 by construction: exact verify at the same threshold
    assert((widened diff exactPairs).isEmpty,
      s"widened config emitted pairs the exact scan rejects: ${(widened diff exactPairs).take(5)}")
    val pairRecall = (exactPairs intersect widened).size.toDouble / exactPairs.size
    info(f"widened (8x6xr3) pair recall vs d5: $pairRecall%.3f " +
      f"(${(exactPairs intersect widened).size}/${exactPairs.size})")
    assert(pairRecall >= 0.90, f"pair recall $pairRecall%.3f below the 0.90 floor")

    def coMembers(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val comp = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      comp.groupBy(_._2).values.flatMap { members =>
        val ids = members.map(_._1).sorted
        for { i <- ids.indices; j <- i + 1 until ids.length } yield (ids(i), ids(j))
      }.toSet
    }
    import org.apache.spark.sql.functions.col
    val exactCo = coMembers(D10SemanticClusters.run(spark, TestSpark.sf001))
    sweep()
    val widenedPairsDf = verifiedPairsWith(spark, TestSpark.sf001,
      tablesFor(8, 6), probeMasksFor(8, 3)).select(col("vec_a"), col("vec_b"))
    val lshCo = coMembers(D10SemanticClusters.runOverPairs(
      spark, widenedPairsDf, D7DupClusters.defaultEdgePartitions, "d16_crossover"))
    sweep()
    assert(exactCo.nonEmpty)
    val coRecall = (exactCo intersect lshCo).size.toDouble / exactCo.size
    info(f"widened (8x6xr3) co-membership recall vs d10: $coRecall%.3f")
    assert(coRecall >= 0.90, f"co-membership recall $coRecall%.3f below the 0.90 floor")
  }
}
