package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** k6 beyond the oracle: the reliability table must be a faithful regrouping
  * of k4's PUBLISHED scores (recomputed independently driver-side), the
  * bins must partition the corpus, and each bin's mean predicted score must
  * actually lie inside its own decile — the structural claims that make the
  * diagram readable as a calibration statement.
  */
class CalibrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("k6 is exactly k4's scores regrouped; bins partition; means sit in their decile") {
    val scored = K4QualityClassifier.run(spark, TestSpark.sf001)
      .select(col("is_ref"), col("score"))
      .collect().map(r => (r.getBoolean(0), r.getDouble(1)))
    val expected = scored
      .groupBy { case (_, s) => math.min(math.floor(s * 10).toLong, 9L) }
      .map { case (b, xs) => b -> ((xs.length.toLong, xs.count(_._1).toLong)) }
    val k6 = K6Calibration.run(spark, TestSpark.sf001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(k6.keySet == expected.keySet)
    assert(k6.values.map(_._1).sum == scored.length, "bins must partition the corpus")
    expected.foreach { case (b, (n, nPos)) =>
      val (kn, kPos, meanScore, posRate) = k6(b)
      assert((kn, kPos) == ((n, nPos)), s"bin $b counts diverge from k4's published scores")
      assert(meanScore >= b / 10.0 - 1e-6 && meanScore < (b + 1) / 10.0 + 1e-6,
        s"bin $b mean score $meanScore escaped its decile")
      assert(posRate >= 0.0 && posRate <= 1.0)
    }
    // the expected-calibration-error the table exists to expose is finite
    // and computable from its own columns
    val total = scored.length.toDouble
    val ece = k6.values.map { case (n, _, ms, pr) => n / total * math.abs(ms - pr) }.sum
    info(f"ECE over ${k6.size} bins at sf0.01: $ece%.4f")
    assert(ece >= 0.0 && ece <= 1.0)
  }
}
