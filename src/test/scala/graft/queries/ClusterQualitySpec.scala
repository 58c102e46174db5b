package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for v5/g5 beyond the DuckDB gate: both replayed serially from
  * d16's own collected outputs (clusters + pairs), plus the conservation
  * laws that tie the tables back to the graph (handshake lemma for g5;
  * membership/purity bounds for v5).
  */
class ClusterQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("v5 == serial argmax replay over d16's clusters; bounds + conservation hold") {
    val comp = D16SemanticLshClusters.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val labels = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = comp.groupBy(_._2).map { case (c, members) =>
      val ys = members.map(m => labels(m._1))
      val counts = ys.groupBy(identity).view.mapValues(_.size).toSeq
      val (majY, majC) = counts.sortBy { case (y, n) => (-n, y) }.head
      c -> (members.length.toLong, majY,
        math.round(majC.toDouble / members.length.toDouble * 1e6))
    }
    val got = V5ClusterPurity.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3)))
      .toMap
    assert(got == want.toMap,
      s"first diff: ${want.find(kv => got.get(kv._1) != Some(kv._2))}")
    // conservation: cluster masses sum to the clustered-vector count;
    // purity in (0, 1e6]; singletons are pure by definition
    assert(got.values.map(_._1).sum == comp.length.toLong)
    assert(got.values.forall(v => v._3 > 0 && v._3 <= 1000000L))
    got.filter(_._2._1 == 1L).foreach { case (c, v) =>
      assert(v._3 == 1000000L, s"singleton cluster $c not pure: $v")
    }
    assert(got.values.exists(_._1 > 1), "no multi-member cluster — purity pin vacuous")
  }

  test("g5 == serial degree replay over d16's pairs; handshake lemma holds") {
    val pairs = D16SemanticLshClusters.verifiedPairs(spark, TestSpark.sf0001)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = deg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = G5DegreeCensus.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // handshake lemma: sum(degree * n_nodes) == 2 |pairs|
    assert(got.map { case (d, n) => d * n }.sum == 2L * pairs.length)
    // every pair endpoint is counted exactly once in the census
    assert(got.values.sum == deg.size.toLong)
    assert(pairs.nonEmpty, "vacuous fixture")
  }
}
