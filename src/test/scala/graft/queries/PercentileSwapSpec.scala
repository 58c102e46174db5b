package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q14's scale note promises that at corpus scale the exact sort-per-group
  * percentile swaps for the `approx_percentile` sketch. A promised swap
  * nobody has run is a comment — this pins that the sketch, at the accuracy
  * the swap would ship with, tracks the oracle-verified exact path on the
  * same data and grouping.
  */
class PercentileSwapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_percentile (accuracy 10k) tracks exact p50/p95 within 0.5% per group") {
    val exact = Q14Percentiles.run(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("p50"), col("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p50"), element_at(col("ps"), 2).as("p95"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (flag, (p50, p95)) =>
      val (a50, a95) = approx(flag)
      assert(math.abs(a50 - p50) / p50 <= 0.005,
        f"group $flag p50: approx $a50%.2f vs exact $p50%.2f drifts > 0.5%%")
      assert(math.abs(a95 - p95) / p95 <= 0.005,
        f"group $flag p95: approx $a95%.2f vs exact $p95%.2f drifts > 0.5%%")
    }
  }
}
