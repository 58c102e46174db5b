package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins p18's ordering contract (round-13 verdict #3): positions are a
  * bijection onto 1..N, stage is non-decreasing along the position order
  * (the curriculum), stage 0 occupies exactly the prefix, and the whole
  * order is deterministic across runs (the hash shuffle is seeded by
  * doc_id alone).
  */
class CurriculumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("p18: bijection, stage-monotone positions, stage-0 prefix, determinism (sf0.001)") {
    val rows = P18Curriculum.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(n > 0)
    // bijection: positions are exactly 1..N, each doc once
    assert(rows.map(_._4).sorted.toSeq == (1L to n.toLong),
      "positions are not a bijection onto 1..N")
    assert(rows.map(_._1).distinct.length == n, "a doc_id appears twice")
    // strictly stage-monotone: walking the training order never returns to
    // an easier stage
    val byPos = rows.sortBy(_._4)
    assert(byPos.sliding(2).forall { case Array(a, b) => a._3 <= b._3; case _ => true },
      "stage decreased along the position order")
    // stage assignment matches the pinned thresholds, and stage 0 is the
    // exact prefix: every stage-0 doc sits before every stage>0 doc
    byPos.foreach { case (id, nTok, stage, _) =>
      assert(stage == math.min(3L, nTok / 32L), s"doc $id: stage $stage for $nTok tokens")
    }
    val n0 = byPos.count(_._3 == 0L)
    assert(byPos.take(n0).forall(_._3 == 0L), "stage 0 is not the position prefix")
    if (n0 < n) assert(byPos(n0)._3 > 0L)
    // determinism: a second run emits the identical order
    val again = P18Curriculum.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._4).toSeq == byPos.toSeq, "training order is not reproducible")
  }
}
