package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariant pins for v6's clamped label propagation — the properties the
  * hash gate can't see from one output alone: the clamp (seeds and earlier
  * rounds are never rewritten), frontier attribution (a round-r label
  * requires an earlier-round neighbour), and coverage monotonicity.
  */
class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private lazy val out = V6LabelPropagation.run(spark, sf).collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))

  test("round-0 rows are EXACTLY the seed slice with their true labels (the clamp's base)") {
    import org.apache.spark.sql.functions._
    val seeds = graft.Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(4)) === 0)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val r0 = out.filter(_._3 == 0).map(t => (t._1, t._2)).toSet
    assert(r0 == seeds)
  }

  test("each node is labeled at most once (clamped), rounds within [0, 3]") {
    val ids = out.map(_._1)
    assert(ids.distinct.length == ids.length, "a node was relabeled across rounds")
    assert(out.forall(t => t._3 >= 0 && t._3 <= V6LabelPropagation.rounds))
  }

  test("frontier attribution: every round-r label has a neighbour labeled at round < r") {
    import org.apache.spark.sql.functions._
    val pairs = D16SemanticLshClusters.verifiedPairs(spark, sf)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).toSet) }
    val roundOf = out.map(t => (t._1, t._3)).toMap
    out.filter(_._3 > 0).foreach { case (id, _, r) =>
      val earlier = nbrs.getOrElse(id, Set.empty)
        .exists(n => roundOf.get(n).exists(_ < r))
      assert(earlier, s"node $id labeled at round $r with no earlier-round neighbour")
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  test("propagation reaches beyond the seeds (the query's reason to exist)") {
    assert(out.exists(_._3 > 0), "no label propagated — fixture or edge chain regressed")
  }
}
