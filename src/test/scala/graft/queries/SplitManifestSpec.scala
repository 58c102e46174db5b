package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** p13 beyond the oracle — the three properties the query exists for:
  *
  *  - GROWTH STABILITY: assignments computed over half the corpus are
  *    identical to the full corpus's assignments restricted to that half
  *    (pure hash threshold), while s3's rank mechanism — run at a quota
  *    chosen to make membership tight — demonstrably reshuffles membership
  *    on the same half/full comparison. The contrast is the design
  *    argument: rank selects exactly-k (and must reshuffle as data grows),
  *    thresholds select a stable fraction.
  *  - PARTITION: every doc lands in exactly one split, ratios near 98/1/1.
  *  - DIGEST SENSITIVITY: removing a single document flips its split's
  *    member_xor (the manifest cannot silently lose a doc).
  */
class SplitManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = Tables.documents(spark, TestSpark.sf001)
  private lazy val half = docs.filter(col("doc_id") % 2 === 0)

  test("hash-threshold assignment is growth-stable; rank sampling is not") {
    val full = P13SplitManifest.assignments(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val halfAssign = P13SplitManifest.assignments(half)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(halfAssign.nonEmpty)
    halfAssign.foreach { case (id, s) =>
      assert(full(id) == s, s"doc $id changed split when the corpus grew: $s -> ${full(id)}")
    }
    // s3's mechanism at a tight quota: top-half-by-hash per lang. Membership
    // computed on the half corpus vs restricted from the full corpus MUST
    // differ for some doc — rank positions shift as the population grows.
    import org.apache.spark.sql.expressions.Window
    def topHalf(df: org.apache.spark.sql.DataFrame): Set[Long] = {
      val w = Window.partitionBy(col("lang"))
        .orderBy(graft.functions.Portable.hash60(concat(lit("samp:"), col("doc_id").cast("string"))).asc,
          col("doc_id").asc)
      val n = df.count()
      df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n / 8)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    }
    val rankFull = topHalf(docs).filter(_ % 2 == 0)
    val rankHalf = topHalf(half)
    assert(rankHalf != rankFull,
      "rank-based membership should reshuffle between corpus sizes — it is the unstable mechanism p13 avoids")
  }

  test("splits partition the corpus at ~98/1/1") {
    val a = P13SplitManifest.assignments(docs).select(col("doc_id"), col("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(a.length == docs.count())
    assert(a.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    val trainFrac = a.count(_._2 == "train").toDouble / a.length
    assert(trainFrac > 0.95 && trainFrac < 0.999, s"train fraction $trainFrac drifted from 0.98")
  }

  test("member_xor flips when a single document is dropped") {
    def digests(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      P13SplitManifest.assignments(df)
        .groupBy(col("split")).agg(expr("bit_xor(mh)").as("x"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = digests(docs)
    val victim = P13SplitManifest.assignments(docs)
      .filter(col("split") === "train").select(col("doc_id")).head().getLong(0)
    val without = digests(docs.filter(col("doc_id") =!= victim))
    assert(without("train") != base("train"),
      "dropping a train doc must change the train digest")
    assert(without.view.filterKeys(_ != "train").toMap == base.view.filterKeys(_ != "train").toMap,
      "other splits' digests must be untouched")
  }
}
