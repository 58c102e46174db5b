package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skew evidence on d16's REAL join: the (table, bucket) candidate join is
  * the query's one skew-exposed shuffle — a template/boilerplate family of
  * near-identical embeddings all hashes into ONE sign-LSH bucket, making a
  * single join key quadratic in family size (the d9 hot-shingle hazard in
  * LSH form). These tests pin that the salted route returns the identical
  * cluster result on (a) a fixture built to be pathologically skewed — one
  * 100-vector family in one bucket — and (b) the real corpus slice.
  */
class D16SaltedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val rows = df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    rows
  }

  /** Fixture: 100 near-identical vectors (one dominant axis, tiny per-id
    * second component — mutually cos ≈ 1, so ONE hot bucket per table and a
    * quadratic hot key) plus 20 axis-distinct vectors (mutually cos 0,
    * spread across buckets).
    */
  private lazy val skewDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d16skew").toString
    val dims = 64
    def vec(axis: Int, minor: Float): Array[Float] = {
      val a = Array.fill(dims)(0.0f)
      a(axis) = 1.0f
      if (minor != 0.0f) a((axis + 1) % dims) = minor
      a
    }
    val hot = (0L until 100L).map(i => (i, vec(0, 0.001f * (i + 1)), 0))
    val cold = (100L until 120L).map(j => (j, vec((j - 99).toInt, 0.0f), 1))
    (hot ++ cold).toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("salted (table,bucket) join (salts=8) is identical on the hot-bucket fixture") {
    val plain = canon(D16SemanticLshClusters.run(spark, skewDir, 4))
    val salted = canon(D16SemanticLshClusters.run(spark, skewDir, 4, bucketSalts = 8))
    assert(plain.nonEmpty)
    // the fixture must actually be hot: the 100-family clusters into ONE
    // component labeled by its min id 0
    assert(plain.count(_.endsWith("|0")) == 100, "hot family did not cluster")
    assert(salted == plain)
  }

  test("salted join is identical on the real sf0.001 corpus") {
    val plain = canon(D16SemanticLshClusters.run(spark, TestSpark.sf0001, 4))
    val salted = canon(D16SemanticLshClusters.run(spark, TestSpark.sf0001, 4, bucketSalts = 4))
    assert(plain.nonEmpty)
    assert(salted == plain)
  }
}
