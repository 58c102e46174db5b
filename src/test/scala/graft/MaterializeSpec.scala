package graft

import org.scalatest.funsuite.AnyFunSuite

/** The shared-stage layer's contract: disabled = identity (the default every
  * other suite runs under), enabled = build-once / read-many with results
  * identical to inline execution. The full-surface oracle gate runs WITH
  * sharing on (Verify enables it), so cross-engine equality is covered
  * there; this spec pins the mechanics.
  */
class MaterializeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("enabled: consumer results equal inline results; each stage builds once") {
    import graft.queries._
    assert(!Materialize.enabled, "suites must start with sharing off")
    // inline (unshared) references
    val p5Inline = canon(P5Decontaminated.run(spark, TestSpark.sf0001))
    val g3Inline = canon(G3PageRankLsh.run(spark, TestSpark.sf0001))
    spark.catalog.clearCache()
    Materialize.enable()
    try {
      val before = Materialize.buildCosts.keySet
      val p5Shared = canon(P5Decontaminated.run(spark, TestSpark.sf0001))
      val p12 = P12AttritionFunnel.run(spark, TestSpark.sf0001).collect()
      val g3Shared = canon(G3PageRankLsh.run(spark, TestSpark.sf0001))
      val g4 = G4TrianglesLsh.run(spark, TestSpark.sf0001).collect()
      assert(p5Shared == p5Inline, "p5 diverged under sharing")
      assert(g3Shared == g3Inline, "g3 diverged under sharing")
      assert(p12.nonEmpty && g4.nonEmpty)
      val built = Materialize.buildCosts.keySet -- before
      // p5+p12 share p1_dispositions and d9_contamination; g3+g4 share
      // d16_verified_pairs — one build each, not one per consumer.
      val names = built.map(_.takeWhile(_ != '@'))
      assert(names.contains("p1_dispositions") && names.contains("d9_contamination")
        && names.contains("d16_verified_pairs"), s"built: $built")
      assert(built.size == names.size, s"a stage built more than once: $built")
    } finally {
      Materialize.disable()
      spark.catalog.clearCache()
    }
  }

  test("disabled: table() is the identity (no files written, builder plan returned)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(5).toDF("id").withColumn("x", col("id") * 2)
    val out = Materialize.table(spark, "identity_probe", "nowhere")(df)
    assert(out eq df, "disabled table() must return the builder frame itself")
    assert(Materialize.buildCosts.keySet.forall(!_.startsWith("identity_probe")))
  }
}
