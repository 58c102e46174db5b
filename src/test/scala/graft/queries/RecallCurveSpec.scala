package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for s13 beyond the DuckDB hash gate — the two structural theorems
  * the curve must satisfy and the informativeness the driver data happens
  * to exhibit:
  *
  *  - MONOTONE: recall@10 never decreases with nprobe, per query. This is
  *    a theorem, not a tendency — a true-top-10 member inside any
  *    candidate set is automatically inside that set's top-10 (at most 9
  *    vectors beat it anywhere), so hits = |true10 ∩ C_p| and C_p grows
  *    with p. A violation means the rank windows or the probe-rank carry
  *    broke.
  *  - ENDPOINT: nprobe = nlist probes every list — the candidate set is
  *    the whole corpus and recall must be exactly 1.0 for every query.
  *  - INFORMATIVE: at nprobe = 1 the curve sits strictly below 1.0 in
  *    aggregate on the driver corpus (otherwise the table recommends
  *    nprobe 1 and measures nothing).
  */
class RecallCurveSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def curve(sf: String): Map[(Long, Long), (Long, Double)] =
    S13AnnRecallCurve.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap

  test("s13: recall@10 is monotone in nprobe per query; nprobe=nlist hits 1.0 (sf0.001)") {
    val c = curve(TestSpark.sf0001)
    val probes = S13AnnRecallCurve.nProbes
    val qids = c.keys.map(_._2).toSeq.distinct
    assert(c.size == probes.size * qids.size, "lattice not total")
    qids.foreach { q =>
      val recalls = probes.map(p => c((p, q))._2)
      assert(recalls.sliding(2).forall { case Seq(a, b) => a <= b; case _ => true },
        s"recall not monotone for query $q: $recalls")
      assert(c((16L, q)) == ((10L, 1.0)),
        s"probing every list must be the exhaustive search for query $q: ${c((16L, q))}")
    }
  }

  test("s13: the curve is informative — nprobe=1 misses neighbours (sf0.01)") {
    val c = curve(TestSpark.sf001)
    val atOne = c.collect { case ((1L, q), (h, _)) => h }
    info(s"hits@nprobe=1 per query: ${atOne.toSeq.sorted.mkString(",")} of 10")
    assert(atOne.sum < 10L * atOne.size,
      "every query already exact at nprobe=1 — the curve measures nothing at this SF")
    val atEnd = c.collect { case ((16L, _), (h, _)) => h }
    assert(atEnd.forall(_ == 10L))
  }
}
