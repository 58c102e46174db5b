package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** j1: revenue per nation — lineitem ⋈ orders ⋈ customer ⋈ nation. The
  * reference has no joins at all (SURVEY §2.E); this is part of the engine's
  * relational completeness surface.
  *
  * Scale plan: lineitem⋈orders and ⋈customer are key-shuffle joins (both
  * sides scale with data; at 100 TB neither is broadcastable) — AQE picks
  * broadcast automatically when a side is small at runtime. `nation` is
  * fixed-size (25 rows) and broadcast explicitly so the planner never
  * considers shuffling it. Aggregation happens AFTER the joins but groups on
  * a 25-value key, so the final shuffle is negligible; the join shuffles
  * dominate and they are unavoidable without co-partitioned storage
  * (bucketing both fact tables on the join key would eliminate them).
  */
object J1JoinRevenue extends GraftQuery {
  val name = "j1_join_revenue"
  val describe = "revenue per nation via lineitem⋈orders⋈customer⋈broadcast(nation)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
  }

  val oracle = Some(
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |       count(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin)
}

/** j2: top-k customers by revenue — aggregate-then-sort-limit. Spark plans
  * the limit as TakeOrderedAndProject (per-partition top-k, then k-way merge
  * on the driver): no global sort materializes, which is the property that
  * matters at 10^9 group keys. Ties broken by customer key so both engines
  * select the same set.
  */
object J2TopK extends GraftQuery {
  val name = "j2_topk_customers"
  val describe = "top-10 customers by revenue (TakeOrderedAndProject, no global sort)"

  private val k = 10

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  val oracle = Some(
    s"""SELECT c_custkey, c_name,
       |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_custkey, c_name
       |ORDER BY revenue DESC, c_custkey ASC
       |LIMIT $k""".stripMargin)
}
