package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for t28 beyond the DuckDB gate: evidence-mass consistency with the
  * shared hits chain (Σ n_dup_grams == the hit-position count d18/p7
  * consume), the short-doc rule, bounds, and the discriminating fixture —
  * a doc made of corpus-repeated text scores 0 novelty while a unique doc
  * scores 1e6.
  */
class GramNoveltySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("t28 mass == hits mass; bounds; short docs vacuously novel (sf0.001)") {
    val rows = T28GramNovelty.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val hitMass = ExactSubstr.hits(spark, TestSpark.sf0001).count()
    assert(rows.map(_._3).sum == hitMass,
      "per-doc dup-gram mass diverged from the hits chain d18/p7 consume")
    rows.foreach { case (id, ng, nd, nov) =>
      assert(nd >= 0 && nd <= ng || ng == 0, s"doc $id: impossible dup mass $nd/$ng")
      assert(nov >= 0 && nov <= 1000000L, s"doc $id: novelty out of range $nov")
      if (ng == 0) assert(nov == 1000000L, s"short doc $id must be vacuously novel")
      if (nd == 0) assert(nov == 1000000L, s"undup'd doc $id must score 1e6")
    }
    assert(rows.exists(_._3 > 0), "no duplicated grams — fixture vacuous for t28")
  }

  test("a corpus-repeated doc scores 0; a unique doc scores 1e6 (synthetic via hitsOn)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val boiler = (1 to 30).map(i => s"tok$i").mkString(" ")
    val unique = (1 to 30).map(i => s"only$i").mkString(" ")
    val docs = Seq((1L, boiler), (2L, boiler), (3L, unique)).toDF("doc_id", "text")
    val grams = docs.select(col("doc_id"),
      size(TextOps.gramHashes(TextOps.tokenHashes(TextOps.tokens(col("text"))), 10))
        .cast("long").as("n_grams"))
    val dup = ExactSubstr.hitsOn(docs).groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))
    val nov = grams.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), coalesce(col("n_dup"), lit(0L)).as("nd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // docs 1/2 are verbatim copies: EVERY gram position duplicated -> novelty 0
    assert(nov(1L)._1 == 21L && nov(1L)._2 == 21L, s"boiler doc: ${nov(1L)}")
    assert(nov(2L) == nov(1L))
    // doc 3 shares nothing: zero duplicated positions -> novelty 1e6
    assert(nov(3L)._1 == 21L && nov(3L)._2 == 0L, s"unique doc: ${nov(3L)}")
  }

  test("plan pin: t28's consumer never re-hashes the corpus (the r13 6.85x slope regression)") {
    // The n_grams branch is greatest(size(tokens)-k+1, 0) — a count, not a
    // hash pass. Under Bench's shape (hits as a shared stage) the ONLY md5
    // in the old plan was that wasted per-token hash (tokenHashes =
    // md5-derived hash60): its reappearance IS the 6.85x slope coming back
    // (sf1: 7.83s hash pass vs 0.72s count; consumer 8.52s -> 0.31s).
    graft.Materialize.enable()
    try {
      ExactSubstr.hits(spark, TestSpark.sf0001).count() // stage in place
      val plan = T28GramNovelty.run(spark, TestSpark.sf0001)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("md5"),
        "t28's consumer plan hashes tokens again — the r13 slope regression")
    } finally {
      graft.Materialize.disable()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }
}
