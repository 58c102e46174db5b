package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The HLL sketch path (`approx_count_distinct`) is the scale escape hatch
  * for w10's exact distinct counts; its estimates are engine-specific so the
  * oracle can't hash them — this spec is its correctness gate instead
  * (the d14/t15 calibration discipline): every (day, type) estimate must
  * land within the configured relative error of the oracle-verified exact
  * count.
  */
class HllSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct stays within 5% of w10's exact daily uniques") {
    val daySec = 86400L
    val approx = Tables.events(spark, TestSpark.sf001)
      .withColumn("day", (floor(unix_timestamp(col("ts")) / daySec) * daySec).cast("long"))
      .groupBy(col("day"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("est"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = W10DailyUniques.run(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(exact.nonEmpty && approx.keySet == exact.keySet)
    val worst = exact.map { case (k, n) =>
      math.abs(approx(k) - n).toDouble / n
    }.max
    info(f"worst HLL relative error at sf0.01: $worst%.4f over ${exact.size} groups")
    assert(worst <= 0.05, f"HLL estimate drifted $worst%.4f > 5%% from exact")
  }
}
