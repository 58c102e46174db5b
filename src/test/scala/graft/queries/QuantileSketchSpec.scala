package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The quantile-sketch path (`approx_percentile`, Greenwald-Khanna) is the
  * scale escape hatch q14's scaladoc promises: exact grouped percentiles
  * sort every group's values, which at 100 TB is a per-group distributed
  * sort, while the GK sketch is a bounded-size mergeable summary that rides
  * partial aggregation like any other combiner. Its estimates are
  * engine-specific so the oracle can't hash them — this spec is its
  * correctness gate instead (the HllSpec discipline): every per-group
  * estimate must land within the sketch's accuracy contract of the
  * oracle-verified exact value.
  *
  * GK's guarantee is RANK error (within 1/accuracy of the requested rank),
  * not value error, so the assertion converts: the estimated p50/p95 must
  * sit between the exact values at ranks (p ± 2/accuracy) — the doubled
  * tolerance absorbs interpolation-vs-nearest-rank definitional slack at
  * group-size granularity.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_percentile lands within GK rank error of q14's exact percentiles") {
    val accuracy = 1000 // rank error <= n / accuracy
    val est = Tables.lineitem(spark, TestSpark.sf001)
      .groupBy(col("l_returnflag"))
      .agg(expr(s"approx_percentile(l_extendedprice, array(0.5, 0.95), $accuracy)").as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap

    val groups = Tables.lineitem(spark, TestSpark.sf001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(groups.nonEmpty && est.keySet == groups.keySet)

    for ((flag, sorted) <- groups; (p, i) <- Seq(0.5 -> 0, 0.95 -> 1)) {
      val n = sorted.length
      val slack = 2.0 / accuracy
      def valueAtRank(q: Double) =
        sorted(math.max(0, math.min(n - 1, math.round(q * (n - 1)).toInt)))
      val lo = valueAtRank(p - slack)
      val hi = valueAtRank(p + slack)
      val got = est(flag)(i)
      assert(got >= lo && got <= hi,
        f"group $flag p$p: estimate $got%.2f outside rank-error band [$lo%.2f, $hi%.2f] (n=$n)")
    }
  }
}
