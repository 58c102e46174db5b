package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** k5's threshold sweep must be a pure recount of k4's published scores —
  * no re-derivation anywhere — so an independent Scala fold over k4's
  * output is the ground truth, and the standard confusion-matrix
  * identities hold at every threshold.
  */
class ClassifierEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("k5 counts are an exact recount of k4's scores; identities + monotonicity hold") {
    val scored = K4QualityClassifier.run(spark, TestSpark.sf0001)
      .select("is_ref", "score").collect()
      .map(r => (r.getBoolean(0), r.getDouble(1)))
    val n = scored.length
    val nRef = scored.count(_._1)
    assert(n > 0 && nRef > 0 && nRef < n)

    val rows = K5ClassifierEval.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getDouble(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 9).map(_ / 10.0))

    for ((t, (tp, fp, fn, tn)) <- rows) {
      val eTp = scored.count { case (ref, s) => s >= t && ref }
      val eFp = scored.count { case (ref, s) => s >= t && !ref }
      assert((tp, fp) == (eTp.toLong, eFp.toLong), s"t=$t")
      assert(tp + fn == nRef, s"t=$t: tp+fn != |refs|")
      assert(tp + fp + fn + tn == n, s"t=$t: counts don't partition the corpus")
    }
    // raising the cut can only lose positives (tp monotone non-increasing)
    val tps = rows.map(_._2._1)
    assert(tps.zip(tps.tail).forall { case (a, b) => b <= a },
      s"tp not monotone: ${tps.mkString(",")}")
  }
}
