package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CosineSimilarity
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.operators.VectorOps

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native expression is bit-identical to the unrolled built-in formula") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("vec_id"), col("embedding"),
        VectorOps.norm(col("embedding"), 64).as("nrm"))
    val both = e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(2000)
      .select(
        CosineSimilarity.cosineSimilarity(col("a.embedding"), col("b.embedding")).as("native"),
        (VectorOps.dot(col("a.embedding"), col("b.embedding"), 64) /
          (col("a.nrm") * col("b.nrm"))).as("unrolled"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // Same IEEE ops in the same order — exact equality, not tolerance.
      assert(r.getDouble(0) == r.getDouble(1),
        s"bit drift: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("registered for SQL use") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c," +
        " cosine_similarity(array(2.0D, 0.0D), array(1.0D, 0.0D)) AS s").head
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 1.0)
  }

  test("float arrays widen implicitly and exactly") {
    CosineSimilarity.register(spark)
    // Same values as float-then-widened vs native double inputs must agree
    // bit-for-bit (float→double widening is exact for these literals).
    val r = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.5 AS FLOAT), CAST(0.25 AS FLOAT)), array(3.0D, 7.0D)) AS viaFloat," +
        " cosine_similarity(array(1.5D, 0.25D), array(3.0D, 7.0D)) AS viaDouble").head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("zero-norm input yields NULL, not NaN (portable missing-data semantics)") {
    CosineSimilarity.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(0.0D, 0.0D), array(1.0D, 2.0D)) AS za," +
        " cosine_similarity(array(1.0D, 2.0D), array(0.0D, 0.0D)) AS zb," +
        " cosine_similarity(array(0.0D), array(0.0D)) AS zz").head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
    // Interpreted path agrees with codegen.
    val expr = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.0, 0.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0, 2.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null) == null)
  }

  test("mismatched array lengths fail loudly instead of truncating") {
    CosineSimilarity.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0D, 2.0D), array(1.0D)) AS c").head
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("lengths differ")))
  }

  test("fused dot_product LSH buckets == unrolled lshBucket bit-for-bit") {
    org.apache.spark.sql.graft.DotProduct.register(spark)
    val planes = VectorOps.hyperplanes(nPlanes = 4, d = 64, seed = 42L)
    val mismatches = Tables.embeddings(spark, TestSpark.sf0001)
      .select(
        VectorOps.lshBucket(col("embedding"), planes).as("unrolled"),
        VectorOps.lshBucketFused(col("embedding"), planes).as("fused"))
      .filter(col("unrolled") =!= col("fused"))
      .count()
    assert(mismatches == 0)
  }

  test("codegen path compiles (no interpreted fallback in plan)") {
    CosineSimilarity.register(spark)
    val df = spark.range(100).select(
      CosineSimilarity.cosineSimilarity(
        array(col("id").cast("double"), lit(1.0)),
        array(lit(2.0), col("id").cast("double"))).as("c"))
    df.collect() // forces codegen compilation; CodegenFallback would not throw but
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen stage:\n$plan")
  }
}
