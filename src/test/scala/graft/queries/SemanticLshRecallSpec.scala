package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins d16 (bucketed semantic dedup) against the exact path, the
  * AnnRecallSpec discipline applied to the cluster surface:
  *
  *   - PAIR recall: fraction of d5's exact cosine-≥-0.35 pairs that
  *     survive d16's LSH candidate generation + exact verify;
  *   - CO-MEMBERSHIP recall: fraction of d10's same-component vector pairs
  *     that d16 also co-clusters — the metric that matters to a curation
  *     job (it dedups by component, not by pair).
  *
  * Floors are measured-at-sf0.01-minus-margin; tuning the table/plane/probe
  * constants can only pass by keeping recall.
  */
class SemanticLshRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sweep(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

  test("d16 pair + co-membership recall vs exact d5/d10 at sf0.01 stays above 0.90") {
    val exactPairs = D5EmbedDedup.run(spark, TestSpark.sf001)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = D16SemanticLshClusters.verifiedPairs(spark, TestSpark.sf001)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exactPairs.nonEmpty, "no exact pairs — the fixture is vacuous")
    val pairRecall = (exactPairs intersect lshPairs).size.toDouble / exactPairs.size
    info(f"d16 pair recall vs d5: $pairRecall%.3f " +
      f"(${(exactPairs intersect lshPairs).size}/${exactPairs.size})")
    // Verified candidates are a SUBSET of the exact pair set by construction
    // (same threshold, exact verify) — precision is 1.0 or the verify broke.
    assert((lshPairs diff exactPairs).isEmpty,
      s"d16 emitted pairs the exact scan rejects: ${(lshPairs diff exactPairs).take(5)}")

    def coMembers(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val comp = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      comp.groupBy(_._2).values.flatMap { members =>
        val ids = members.map(_._1).sorted
        for { i <- ids.indices; j <- i + 1 until ids.length } yield (ids(i), ids(j))
      }.toSet
    }
    val exactCo = coMembers(D10SemanticClusters.run(spark, TestSpark.sf001))
    sweep()
    val lshCo = coMembers(D16SemanticLshClusters.run(spark, TestSpark.sf001))
    sweep()
    assert(exactCo.nonEmpty)
    val coRecall = (exactCo intersect lshCo).size.toDouble / exactCo.size
    info(f"d16 co-membership recall vs d10: $coRecall%.3f " +
      f"(${(exactCo intersect lshCo).size}/${exactCo.size})")
    assert(pairRecall >= 0.90, f"d16 pair recall $pairRecall%.3f below the 0.90 floor")
    assert(coRecall >= 0.90, f"d16 co-membership recall $coRecall%.3f below the 0.90 floor")
  }
}
