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
  *
  * Determinism: prices/quantities are fixed-decimal business values (0.01
  * grid — verified on the generated data), so the sum and mean go through
  * Rounding.exactSum/exactAvg scaled-long arithmetic: order-independent at
  * any scale, where a double sum's √n-growing error would cross the
  * 2-decimal rounding margin around 100× this row count (the t17 lesson
  * applied before it bites).
  */
object Q1Agg extends GraftQuery {
  val name = "q1_agg"
  val describe = "global SUM/COUNT/AVG over lineitem (reference C1 as one-shot aggregate)"

  import graft.functions.Rounding

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      Rounding.exactSum(col("l_extendedprice"), 2, 2).as("sum_price"),
      count(lit(1)).as("n_rows"),
      Rounding.exactAvg(col("l_quantity"), 2, 6).as("avg_qty"))

  val oracle = Some(
    s"""SELECT ${graft.functions.Rounding.exactSumSql("l_extendedprice", 2, 2)} AS sum_price,
       |       count(*) AS n_rows,
       |       ${graft.functions.Rounding.exactAvgSql("l_quantity", 2, 6)} AS avg_qty
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

  // Grid scales (verified on the generated data): quantity/price/discount/
  // tax are 0.01-grid; price×(1−disc) lands on the 1e-4 grid and
  // ×(1+tax) on the 1e-6 grid, with the double products' rounding error
  // (~1e-6 after scaling) far inside the 0.5 integer-recovery tolerance —
  // so every sum/avg below is an exact scaled-long fold on both engines
  // (Rounding.exactSum/exactAvg; the q1 determinism note).
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.Rounding.{exactAvg, exactSum}
    val li = Tables.lineitem(spark, sfDir)
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val charge = col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
      exactSum(col("l_quantity"), 2, 2).as("sum_qty"),
      exactSum(col("l_extendedprice"), 2, 2).as("sum_base_price"),
      exactSum(discPrice, 4, 2).as("sum_disc_price"),
      exactSum(charge, 6, 2).as("sum_charge"),
      exactAvg(col("l_quantity"), 2, 6).as("avg_qty"),
      exactAvg(col("l_extendedprice"), 2, 6).as("avg_price"),
      exactAvg(col("l_discount"), 2, 6).as("avg_disc"),
      count(lit(1)).as("count_order"))
  }

  val oracle = {
    import graft.functions.Rounding.{exactAvgSql, exactSumSql}
    Some(
      s"""SELECT l_returnflag, l_linestatus,
         |       ${exactSumSql("l_quantity", 2, 2)} AS sum_qty,
         |       ${exactSumSql("l_extendedprice", 2, 2)} AS sum_base_price,
         |       ${exactSumSql("l_extendedprice * (1.0 - l_discount)", 4, 2)} AS sum_disc_price,
         |       ${exactSumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6, 2)} AS sum_charge,
         |       ${exactAvgSql("l_quantity", 2, 6)} AS avg_qty,
         |       ${exactAvgSql("l_extendedprice", 2, 6)} AS avg_price,
         |       ${exactAvgSql("l_discount", 2, 6)} AS avg_disc,
         |       count(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus""".stripMargin)
  }
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
