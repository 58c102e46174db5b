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

  test("nightly CDC merge over co-bucketed snapshots plans without any Exchange") {
    // SnapshotMerge's scaladoc names this as the repeated-merge regime:
    // bucket BOTH snapshots on the merge key and every nightly mergeCdc is
    // co-located — the full-outer join (which can never broadcast) runs
    // with zero shuffle. This pins the claim end to end: write base and
    // delta bucketed, run the REAL operator, assert no Exchange anywhere
    // and result equality with the unbucketed plan.
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse-cdc")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, TestSpark.sf0001)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val base = orders.filter(col("o_orderkey") % 7 =!= 0)
      val delta = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("cents") + expr("cents div 10")).as("cents"),
          (col("o_orderkey") % 5 === 0).as("deleted"))
      base.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/base_b").saveAsTable("base_b")
      delta.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/delta_b").saveAsTable("delta_b")

      val merged = SnapshotMerge.mergeCdc(
        spark.table("base_b"), spark.table("delta_b"),
        "o_orderkey", Seq("o_custkey", "cents"))
      merged.collect()
      val p = merged.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"co-bucketed CDC merge still shuffles:\n$p")
      // equality with the unbucketed operator
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1).toSeq
      assert(canon(merged) ==
        canon(SnapshotMerge.mergeCdc(base, delta, "o_orderkey", Seq("o_custkey", "cents"))))
    } finally {
      spark.sql("DROP TABLE IF EXISTS base_b")
      spark.sql("DROP TABLE IF EXISTS delta_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
