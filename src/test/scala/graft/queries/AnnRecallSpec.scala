package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins s2's (sign-LSH ANN) recall against the exact baseline s1 on the
  * pinned query set, so future bucket/plane tuning cannot silently trade
  * recall away — the ANN analogue of SketchSpec's accuracy pins.
  *
  * Recall here = |s2 top-k ∩ s1 top-k| / |s1 top-k| over all pinned queries.
  * The floor is the measured sf0.001 value minus safety margin; the s2
  * scaladoc documents that recall is a function of the pinned seed's bucket
  * geometry (4 planes / 16 buckets at this corpus size).
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("s2 LSH recall vs exact s1 stays above the documented floor") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(S1AnnBrute.run(spark, TestSpark.sf0001))
    val approx = pairs(S2AnnLsh.run(spark, TestSpark.sf0001))
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"s2 recall vs s1 at sf0.001: $recall%.3f (${(exact intersect approx).size}/${exact.size})")
    assert(recall >= 0.75, f"s2 recall $recall%.3f fell below the 0.75 floor")
  }

  test("s4 IVF recall vs exact s1 stays above the documented floor") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(S1AnnBrute.run(spark, TestSpark.sf0001))
    val approx = pairs(S4AnnIvf.run(spark, TestSpark.sf0001))
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(f"s4 recall vs s1 at sf0.001: $recall%.3f (${(exact intersect approx).size}/${exact.size})")
    assert(recall >= 0.50, f"s4 recall $recall%.3f fell below the 0.50 floor")
  }
}
