package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows on one hot key — the shape salting exists for.
  private def skewed = {
    val rows = (1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toDouble))
    rows.toDF("k", "v").repartition(8)
  }

  test("salted aggregation equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val right = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val plain = skewed.join(right, "k")
      .groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, right, "k", salts = 8)
      .groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("phase-1 groups of the hot key actually spread across salts") {
    val phase1Groups = skewed
      .withColumn("__salt", pmod(spark_partition_id(), lit(8)))
      .filter(col("k") === "hot")
      .select(col("__salt")).distinct().count()
    assert(phase1Groups > 1, "hot key stayed on one salt — no spreading")
  }
}
