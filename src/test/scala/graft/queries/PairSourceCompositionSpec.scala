package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the round-7 composition queries against their exact twins and their
  * own invariants:
  *
  *   - g3 (PageRank over d16's bucketed pairs) vs g1 (over d5's exact
  *     pairs): same ranking algorithm, pair sources differing only by d16's
  *     measured sub-1% recall miss — so the top of the ranking must agree.
  *     The pin is top-20-by-pagerank overlap, the metric a curation job
  *     reads (which hubs to inspect), not absolute rank equality, which the
  *     missing edges legitimately perturb further down.
  *   - s10 (MMR selection): the greedy-argmax structural invariants that
  *     hold for ANY data — the step-wise max MMR score is non-increasing
  *     (penalties only grow as the selected set grows, candidates only
  *     shrink), rank 1 is the pure-relevance argmax (empty penalty), and
  *     the selection is duplicate-free with exactly k rows.
  *   - d17 (containment): per-row arithmetic invariants — each directional
  *     containment bounds Jaccard from above (the union is at least either
  *     set), and the returned pairs all clear the report threshold. The
  *     jaccard_missed flag must agree with the jaccard column.
  *   - t18 (source overlap): the diagonal is exactly 1 (every source is
  *     fully contained in itself) — the query's built-in sanity anchor.
  */
class PairSourceCompositionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sweep(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  test("g3 top-20 pagerank hubs overlap g1's at >= 0.8") {
    def top20(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.orderBy(org.apache.spark.sql.functions.col("pagerank").desc,
          org.apache.spark.sql.functions.col("vec_id").asc)
        .limit(20).collect().map(_.getLong(0)).toSet
    val exact = top20(G1PageRank.run(spark, TestSpark.sf001))
    sweep()
    val lsh = top20(G3PageRankLsh.run(spark, TestSpark.sf001))
    sweep()
    assert(exact.size == 20, s"g1 returned ${exact.size} top rows — fixture too small")
    val overlap = (exact intersect lsh).size.toDouble / exact.size
    info(f"g3 top-20 overlap vs g1: $overlap%.2f")
    assert(overlap >= 0.8, f"top-20 hub overlap $overlap%.2f below 0.8")
  }

  test("s10 greedy invariants: monotone scores, top-rel first pick, k unique rows") {
    val rows = S10MmrSelect.run(spark, TestSpark.sf001)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    sweep()
    assert(rows.length == 10, s"expected k=10 rows, got ${rows.length}")
    assert(rows.map(_._2).distinct.length == rows.length, "duplicate vec_id selected")
    // Step-wise max score is non-increasing: each later step optimizes over
    // a subset of candidates with a pointwise-larger penalty.
    val scores = rows.map(_._4)
    scores.sliding(2).foreach { case Array(a, b) =>
      assert(a >= b - 1e-12, s"MMR scores not non-increasing: $a then $b")
    }
    // Rank 1 has no penalty: its score is exactly lambda * rel (in the
    // exact integer space, so the doubles match to an ulp).
    val (_, _, rel1, s1) = rows.head
    assert(math.abs(s1 - 0.7 * rel1) < 1e-9, s"rank-1 score $s1 != 0.7 * $rel1")
    // rel is the max over the shortlist: every later pick's rel is <= it.
    rows.tail.foreach { case (_, _, rel, _) => assert(rel <= rel1 + 1e-12) }
  }

  test("d17 row invariants: containment bounds jaccard, threshold + flag consistent") {
    val rows = D17Containment.run(spark, TestSpark.sf001).collect()
    sweep()
    assert(rows.nonEmpty, "d17 found no containment pairs at sf0.001 — fixture vacuous")
    rows.foreach { r =>
      val (ca, cb, jac, missed) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))
      assert(ca >= jac - 1e-9 && cb >= jac - 1e-9,
        s"containment below jaccard: ca=$ca cb=$cb jac=$jac")
      assert(math.max(ca, cb) >= D17Containment.threshold,
        s"pair below report threshold: ca=$ca cb=$cb")
      assert(missed == (jac < 0.3), s"jaccard_missed flag inconsistent at jac=$jac")
    }
    info(s"d17 pairs: ${rows.length}, jaccard-invisible: ${rows.count(_.getBoolean(6))}")
  }

  test("t18 diagonal containment is exactly 1") {
    val diag = T18SourceOverlap.run(spark, TestSpark.sf001)
      .filter(org.apache.spark.sql.functions.col("source_a") ===
        org.apache.spark.sql.functions.col("source_b"))
      .collect()
    sweep()
    assert(diag.nonEmpty, "no diagonal rows")
    diag.foreach { r =>
      assert(r.getDouble(4) == 1.0, s"diagonal containment ${r.getDouble(4)} != 1")
      assert(r.getLong(2) == r.getLong(3), "diagonal n_shared != n_total")
    }
  }
}
