package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Approximate-aggregate sketches vs their exact counterparts. These cannot
  * be oracle queries (HLL/KLL internals differ per engine), so the accuracy
  * contract is pinned here instead: the sketch must land within its
  * documented error of the exact answer — the validation every sketch
  * deployment at 100 TB rests on (where the exact pass is the one you can
  * no longer afford).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact (HLL++ default rsd)") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).head
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("approx_percentile within 1% relative of exact percentile") {
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.01, s"approx $approx vs exact $exact")
  }

  test("HLL sketches MERGE across batches: union of halves == single pass") {
    // The property incremental ingestion rests on: per-batch sketches
    // (hll_sketch_agg), persisted and unioned later, must estimate like a
    // single pass over everything — that is what lets a 100 TB pipeline
    // keep running distinct counts without ever rescanning history.
    val li = Tables.lineitem(spark, TestSpark.sf001)
    val single = li.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))")).head.getLong(0)
    val halves = li
      .withColumn("batch", col("l_orderkey") % 2)
      .groupBy(col("batch"))
      .agg(expr("hll_sketch_agg(l_partkey)").as("sk"))
    val merged = halves
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head.getLong(0)
    // Mergeability is statistical, not bitwise: the union path may coerce
    // sketches to a different internal mode than the single-pass aggregate
    // (measured: 1991 vs 2023 on this data), so the contract is that BOTH
    // estimates stay inside the sketch's error envelope of the exact count.
    val exact = li.agg(countDistinct(col("l_partkey"))).head.getLong(0)
    for ((name, est) <- Seq("single-pass" -> single, "merged-batch" -> merged))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"$name HLL estimate $est vs exact $exact")
  }

  test("t15 count-min NEVER under-counts (one-sided error guarantee)") {
    val rows = T15CountMin.run(spark, graft.TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    for ((token, freq, est) <- rows)
      assert(est >= freq, s"CMS under-counted '$token': est $est < exact $freq")
  }
}
