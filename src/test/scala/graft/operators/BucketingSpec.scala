package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Bucketed-table co-located joins: writing both fact tables bucketed by the
  * join key lets Spark join them with NO exchange on either side — the
  * storage-level answer to "this join's shuffle becomes the bottleneck at
  * 100 TB" (SURVEY §7; j1's lineitem⋈orders is the candidate).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans without any Exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val li = Tables.lineitem(spark, TestSpark.sf0001)
        .select(col("l_orderkey"), col("l_quantity"))
      val o = Tables.orders(spark, TestSpark.sf0001)
        .select(col("o_orderkey"), col("o_totalprice"))
      li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li_b").saveAsTable("li_b")
      o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/o_b").saveAsTable("o_b")

      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed join still shuffles:\n$p")
      // And the result matches the unbucketed plan.
      val direct = Tables.lineitem(spark, TestSpark.sf0001)
        .join(Tables.orders(spark, TestSpark.sf0001),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val bucketed = joined.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(bucketed == direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
