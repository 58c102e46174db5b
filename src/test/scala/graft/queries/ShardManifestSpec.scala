package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{IndependentHash, TestSpark}

/** Pins for p17 beyond the DuckDB gate: serial replay of the whole layout
  * (order, prefix sum, start-position shard assignment, xor digests),
  * conservation laws, contiguity on the real corpus, and the straddle case
  * on a synthetic fixture (one doc spanning several budgets leaves the
  * intermediate shards genuinely empty — the manifest must report the gap,
  * not invent rows).
  */
class ShardManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def serialManifest(sizes: Seq[(Long, Long)], budget: Long)
      : Map[Long, (Long, Long, Long, Long)] = {
    val ordered = sizes.filter(_._2 > 0)
      .sortBy { case (id, _) => (IndependentHash.md5hash60(s"shard:$id"), id) }
    var cum = 0L
    val rows = ordered.map { case (id, n) =>
      val start = cum; cum += n
      (start / budget, id, n)
    }
    rows.groupBy(_._1).view.mapValues { g =>
      (g.size.toLong, g.map(_._3).sum, g.map(_._3).max,
        g.map(r => IndependentHash.md5hash60(s"sm:${r._2}")).reduce(_ ^ _))
    }.toMap
  }

  test("p17 == serial replay (sf0.001); conservation + contiguity hold") {
    import org.apache.spark.sql.functions._
    val sizes = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), length(col("text").cast("binary")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = serialManifest(sizes, P17ShardManifest.shardBytes)
    val got = P17ShardManifest.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == want,
      s"first diff: ${want.find(kv => got.get(kv._1) != Some(kv._2))}")
    // conservation: every byte and every non-empty doc lands in exactly one shard
    assert(got.values.map(_._2).sum == sizes.filter(_._2 > 0).map(_._2).sum)
    assert(got.values.map(_._1).sum == sizes.count(_._2 > 0).toLong)
    // contiguity: all docs are far smaller than the budget here, so no shard
    // in 0..max can be empty
    val maxDoc = sizes.map(_._2).max
    assert(maxDoc < P17ShardManifest.shardBytes, "fixture assumption broken")
    val ids = got.keySet
    assert(ids == (0L to ids.max).toSet, s"shard ids not contiguous: $ids")
  }

  test("a doc spanning several budgets leaves a REPORTED gap, not invented shards") {
    import spark.implicits._
    // budget 100; doc 1 starts shard 0 and spans ~3.5 budgets; the next doc
    // starts at offset 360 -> shard 3. Shards 1 and 2 hold no doc STARTS and
    // must be absent from the manifest.
    val docBytes = Seq((1L, 350L), (2L, 50L), (3L, 40L)).toDF("doc_id", "n_bytes")
    val rows = P17ShardManifest.manifestOn(spark, docBytes, 100L, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // serial truth under the same hash order
    val ordered = Seq(1L, 2L, 3L).map(id => id ->
      Map(1L -> 350L, 2L -> 50L, 3L -> 40L)(id))
      .sortBy { case (id, _) => (IndependentHash.md5hash60(s"shard:$id"), id) }
    var cum = 0L
    val assign = ordered.map { case (id, n) => val s = cum / 100L; cum += n; (id, s, n) }
    val wantShards = assign.map(_._2).toSet
    assert(rows.keySet == wantShards, s"got ${rows.keySet}, want $wantShards")
    assert(rows.values.map(_._2).sum == 440L)
    // the straddler's shard really spans multiple budgets' worth of bytes
    val straddleShard = assign.find(_._1 == 1L).get._2
    assert(rows(straddleShard)._2 >= 350L)
  }
}
