package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** q14: exact grouped percentiles — Spark's `percentile` and DuckDB's
  * `quantile_cont` share the same linear-interpolation definition (verified
  * bit-identical on this data; outputs rounded to absorb any last-ulp
  * divergence in the interpolation arithmetic).
  *
  * Scale note: exact percentiles sort each group — at corpus scale the
  * approximate sketch (`approx_percentile`, not oracle-matchable) replaces
  * this; the query pins the exact path the sketch is validated against.
  */
object Q14Percentiles extends GraftQuery {
  val name = "q14_percentiles"
  val describe = "grouped exact percentiles (p50/p95) of extendedprice by returnflag"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    // Both percentiles from ONE aggregate: percentile(col, array(...))
    // shares a single per-group value buffer and sort — two scalar
    // percentile() aggregates would each collect and sort their own copy
    // of every group's values (measured ~1.9s → ~1.1s at sf0.1).
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.95))").as("ps"),
        round(min(col("l_extendedprice")), 2).as("min_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p50"),
        round(element_at(col("ps"), 2), 4).as("p95"),
        col("min_price"), col("max_price"))

  val oracle = Some(
    """SELECT l_returnflag,
      |       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
      |       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
      |       round(min(l_extendedprice), 2) AS min_price,
      |       round(max(l_extendedprice), 2) AS max_price
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin)
}
