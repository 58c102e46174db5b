package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Q1 (SURVEY §2.F): global aggregate over lineitem — the relational form of
  * the reference's distributed SUM (guagua-examples/.../sum/SumWorker.java:72-95).
  *
  * Scale: a pure partial+final aggregate — map-side combine on every
  * executor, one row shuffled per partition. Scan is pruned to the two
  * referenced columns (check: ReadSchema in explain).
  */
object Q1Agg extends GraftQuery {
  val name = "q1_agg"
  val describe = "global SUM/COUNT/AVG over lineitem (reference C1 as one-shot aggregate)"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      round(sum(col("l_extendedprice")), 2).as("sum_price"),
      count(lit(1)).as("n_rows"),
      round(avg(col("l_quantity")), 6).as("avg_qty"))

  val oracle = Some(
    """SELECT round(sum(l_extendedprice), 2) AS sum_price,
      |       count(*) AS n_rows,
      |       round(avg(l_quantity), 6) AS avg_qty
      |FROM lineitem""".stripMargin)
}

/** Q7 (SURVEY §2.F): grouped partial+final aggregation, TPC-H Q1 shape —
  * validates the combiner path (reference's eager combine,
  * NettyMasterCoordinator.java:157-236) as Spark's HashAggregate
  * partial→final pair.
  *
  * Scale: group key cardinality is tiny (R/A/N × O/F), so the shuffle after
  * partial aggregation moves |partitions| × |groups| rows — constant in data
  * size. This is the plan shape every large groupBy should collapse to.
  */
object Q7GroupedAgg extends GraftQuery {
  val name = "q7_grouped_agg"
  val describe = "grouped aggregates by (returnflag, linestatus), TPC-H Q1 shape"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      round(sum(col("l_quantity")), 2).as("sum_qty"),
      round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
      round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
      round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
      round(avg(col("l_quantity")), 6).as("avg_qty"),
      round(avg(col("l_extendedprice")), 6).as("avg_price"),
      round(avg(col("l_discount")), 6).as("avg_disc"),
      count(lit(1)).as("count_order"))
  }

  val oracle = Some(
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_extendedprice), 6) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)
}

/** Q10 (SURVEY §2.F): deterministic train/test split counts. The reference
  * splits with unseeded `Math.random()` (nn/NNWorker.java:224-230); we
  * replace it with a pure-arithmetic hash both engines compute identically —
  * the documented semantic upgrade that makes the split reproducible (and
  * therefore shardable: any executor can recompute a row's bucket without
  * coordination).
  */
object Q10Split extends GraftQuery {
  val name = "q10_split"
  val describe = "seeded-hash train/test split counts (reference C6 split, made deterministic)"

  private val bucketExpr =
    "((l_orderkey * 2654435761 + l_linenumber * 2246822519 + 3266489917) % 1000003) % 2"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .withColumn("bucket", expr(bucketExpr))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  val oracle = Some(
    s"""SELECT $bucketExpr AS bucket, count(*) AS cnt
       |FROM lineitem
       |GROUP BY 1""".stripMargin)
}
