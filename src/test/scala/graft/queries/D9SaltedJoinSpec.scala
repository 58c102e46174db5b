package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skew evidence on d9's REAL join (not a toy frame): the probe→reference
  * shingle join is the query's one skew-exposed shuffle — a stopword 3-gram
  * occurring in most probe documents is exactly the hot-key shape
  * Skew.saltedJoin spreads. These tests pin that the salted route returns
  * the identical result on (a) a fixture built to be pathologically skewed —
  * one shingle shared by every probe document — and (b) the real corpus
  * slice the oracle checks.
  */
class D9SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val rows = df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    rows
  }

  /** Fixture: every doc repeats one dominant sentence (a hot shingle in every
    * probe AND the reference set), plus a per-doc unique tail so scores vary.
    */
  private lazy val skewDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d9skew").toString
    val hot = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 240L).map { id =>
      val unique = s"doc $id carries token${id}a token${id}b token${id}c"
      // Reference half (even ids) gets the hot text; probes (odd) lead with
      // it too, so the hot shingles dominate the join's key distribution.
      (id, s"$hot $unique", "en", "fixture", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("salted shingle join (salts=8) is identical to unsalted on the skewed fixture") {
    val plain = canon(D9Contamination.run(spark, skewDir))
    val salted = canon(D9Contamination.run(spark, skewDir, joinSalts = 8))
    assert(plain.nonEmpty)
    // The fixture must actually be skewed: every probe doc overlaps the
    // reference via the hot sentence, so all scores are > 0.
    assert(plain.forall(!_.contains("|0|")), "fixture lost its hot-shingle overlap")
    assert(salted == plain)
  }

  test("salted join is identical to unsalted on the real sf0.001 corpus") {
    val plain = canon(D9Contamination.run(spark, TestSpark.sf0001))
    val salted = canon(D9Contamination.run(spark, TestSpark.sf0001, joinSalts = 4))
    assert(plain.nonEmpty)
    assert(salted == plain)
  }
}
