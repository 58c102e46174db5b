package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Persist-leak contract for the managed run path: a query that pins
  * intermediates (d4 persists its hashed-shingle frame; d7 pins RDDs each
  * propagation round) must leave the session's cache exactly as it found it
  * — including NOT sweeping caches the application owned before the call.
  */
class ManagedRunSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def persistedIds = spark.sparkContext.getPersistentRDDs.keySet

  test("managed d4 run computes through the sink and unpersists its own frames") {
    import spark.implicits._
    // Leave the session clean of stray caches from sibling suites first.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // An application-owned cache that must SURVIVE the managed run.
    val mine = Seq(1, 2, 3).toDF("x").persist()
    mine.count()
    val before = persistedIds
    assert(before.nonEmpty)

    val rows = D4NgramJaccard.runManaged(spark, TestSpark.sf0001)(_.count())
    assert(rows > 0, "sink ran against an empty result — fixture is vacuous")
    assert(persistedIds == before,
      s"managed run leaked or swept caches: before=$before after=$persistedIds")
    mine.unpersist(false)
  }

  test("managed d7 run (RDD-pinning driver loop) leaves no persistent RDDs or cache entries") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val rows = D7DupClusters.runManaged(spark, TestSpark.sf0001)(_.count())
    assert(rows > 0)
    assert(persistedIds.isEmpty,
      s"d7 managed run left pinned RDDs: $persistedIds")
    // CacheManager-level eviction matters as much as block-level: a stale
    // entry silently rewrites the next identical plan fragment onto the old
    // cache (the round-5 d6-baseline bug). d7 runs d4 inside, so this
    // exercises CacheScope's tracking through a nested query.
    assert(spark.sharedState.cacheManager.isEmpty,
      "d7 managed run left SQL CacheManager entries registered")
  }

  test("round-6 persisting queries (t12 loop rewrites, p4 composed stages, d11 shared scan) are cache-clean under managed runs") {
    for (q <- Seq[GraftQuery](T12BpeMerges, T13BpeEncode, P4TrainingCorpus, D11DupSpans)) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val rows = q.runManaged(spark, TestSpark.sf0001)(_.count())
      assert(rows > 0, s"${q.name}: vacuous sink")
      assert(persistedIds.isEmpty, s"${q.name} left pinned RDDs: $persistedIds")
      assert(spark.sharedState.cacheManager.isEmpty,
        s"${q.name} left SQL CacheManager entries registered")
    }
  }

  test("managed run unpersists even when the sink throws") {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    intercept[RuntimeException] {
      D4NgramJaccard.runManaged(spark, TestSpark.sf0001) { df =>
        df.count()
        throw new RuntimeException("sink failure")
      }
    }
    assert(persistedIds.isEmpty)
    assert(spark.sharedState.cacheManager.isEmpty,
      "failed managed run left SQL CacheManager entries registered")
  }
}
