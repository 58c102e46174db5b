package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for k7 beyond the DuckDB hash gate: (1) the selection is exactly
  * the serial recompute from k4's published scores and k5's published
  * sweep — threshold choice (argmax F1, tie → smaller) included; (2) the
  * top-n boundary property holds against the full scored population; and
  * (3) on a synthetic frame with a KNOWN operating point, the queue is
  * ordered by distance-to-threshold with the exactly-on-threshold doc
  * first — the active-learning property the driver corpus' flat scores
  * (0.281–0.304, all on one side of every sweep cut) cannot exhibit.
  */
class UncertaintySampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def scoredRows(sf: String): Array[(Long, Double)] =
    K4QualityClassifier.run(spark, sf).select("doc_id", "score")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

  private def bestThreshold(sf: String): Double = {
    val sweep = K5ClassifierEval.run(spark, sf)
      .select("threshold", "f1").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    sweep.sortBy { case (t, f1) => (-f1, t) }.head._1
  }

  private def serialKeys(sf: String): Seq[(Long, Long)] = {
    val thr = bestThreshold(sf)
    scoredRows(sf)
      .map { case (id, s) => (id, math.round(math.abs(s - thr) * 1e6)) }
      .sortBy { case (id, k) => (k, id) }.toSeq
  }

  test("k7 selection == serial argmax-F1 + distance replay (sf0.001)") {
    val got = K7UncertaintySample.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == serialKeys(TestSpark.sf0001).take(got.size))
  }

  test("k7 boundary: every selected key <= every unselected key (sf0.01)") {
    val got = K7UncertaintySample.run(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(3), r.getLong(0)))
    val all = serialKeys(TestSpark.sf001).map { case (id, k) => (k, id) }
    val unselected = all.toSet -- got.toSet
    assert(got.nonEmpty && unselected.nonEmpty)
    val cut = got.max // lexicographic (key, doc_id) — the admission order
    assert(unselected.forall(u => implicitly[Ordering[(Long, Long)]].gt(u, cut)),
      "an unselected doc sits inside the selected (key, doc_id) boundary")
  }

  test("k7 synthetic: on-threshold doc first, queue ordered by |score-thr|") {
    import spark.implicits._
    // scores 0.0, 0.05, ..., 0.95 with thr pinned at 0.5: doc 10 (score
    // exactly 0.5) must lead, and distance must be non-decreasing down the
    // queue — uncertainty order, not score order.
    val scored = (0L until 20L).map(id => (id, id * 0.05)).toDF("doc_id", "score")
    val best = Seq(0.5).toDF("thr")
    val q = K7UncertaintySample.selectOn(scored, best, 20).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(q.head._1 == 10L, "the exactly-on-threshold doc must lead the queue")
    assert(q.map(_._2).sliding(2).forall { case Array(a, b) => a <= b; case _ => true },
      "queue not ordered by distance to the operating point")
    assert(q.map(_._1).toSet == (0L until 20L).toSet)
  }
}
