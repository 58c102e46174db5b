package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** w3: JSON scalar extraction over events.props — the semi-structured
  * column surface. Uses the Spark 4 VARIANT path (try_parse_json +
  * try_variant_get): measured 1.25x faster than get_json_object on this
  * shape (0.30s vs 0.37s min-of-3 at sf0.1) because the variant binary is
  * built once and the path lookup is a binary probe, not a Jackson re-parse.
  * Both paths are null-safe on malformed JSON (try_parse_json -> NULL).
  * The extraction happens before the aggregate, so the shuffle carries only
  * (type, k) rows.
  */
object W3JsonExtract extends GraftQuery {
  val name = "w3_json_extract"
  val describe = "JSON property extraction from events.props + grouped aggregate"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        try_variant_get(try_parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 6).as("avg_k"))

  val oracle = Some(
    """SELECT event_type, count(*) AS n,
      |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
      |FROM events
      |GROUP BY event_type""".stripMargin)
}

/** q11: ROLLUP grouping sets — subtotal/grand-total rows in one pass
  * (Catalyst expands to a single Expand + aggregate; the reference has no
  * grouping sets at all, SURVEY §2.E).
  */
object Q11Rollup extends GraftQuery {
  val name = "q11_rollup"
  val describe = "ROLLUP(l_returnflag, l_linestatus) with counts and sums"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))

  val oracle = Some(
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
}

/** q12: INTERSECT — customers ordering in both halves of the first year
  * (set semantics: implicit distinct on both sides).
  */
object Q12Intersect extends GraftQuery {
  val name = "q12_intersect"
  val describe = "INTERSECT: custkeys ordering in both 1995-H1 and 1995-H2"

  private val mid = "1995-07-01 00:00:00"
  private val end = "1996-01-01 00:00:00"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val h1 = o.filter(col("o_orderdate") < lit(mid).cast("timestamp"))
      .select(col("o_custkey"))
    val h2 = o.filter(col("o_orderdate") >= lit(mid).cast("timestamp") &&
        col("o_orderdate") < lit(end).cast("timestamp"))
      .select(col("o_custkey"))
    h1.intersect(h2)
  }

  val oracle = Some(
    s"""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '$mid'
       |INTERSECT
       |SELECT o_custkey FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$mid' AND o_orderdate < TIMESTAMP '$end'""".stripMargin)
}

/** q13: EXCEPT — customers ordering in 1995-H1 but not in 1995-H2 (set
  * difference; Catalyst plans this as an aggregate-free anti join).
  */
object Q13Except extends GraftQuery {
  val name = "q13_except"
  val describe = "EXCEPT: custkeys ordering in 1995-H1 but not 1995-H2"

  private val mid = "1995-07-01 00:00:00"
  private val end = "1996-01-01 00:00:00"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    o.filter(col("o_orderdate") < lit(mid).cast("timestamp"))
      .select(col("o_custkey"))
      .except(
        o.filter(col("o_orderdate") >= lit(mid).cast("timestamp") &&
            col("o_orderdate") < lit(end).cast("timestamp"))
          .select(col("o_custkey")))
  }

  val oracle = Some(
    s"""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '$mid'
       |EXCEPT
       |SELECT o_custkey FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$mid' AND o_orderdate < TIMESTAMP '$end'""".stripMargin)
}

/** q21: EXCEPT ALL — bag-semantics set difference (each row's multiplicity
  * is max(0, n_left − n_right)), the variant q13's DISTINCT except cannot
  * express: "which custkeys ordered MORE often in H1 than H2, with the
  * surplus count preserved". Spark plans it as a single grouped
  * count-subtract + generate (no join); at scale it is one hash-partitioned
  * aggregate on the compared row.
  */
object Q21ExceptAll extends GraftQuery {
  val name = "q21_except_all"
  val describe = "EXCEPT ALL: H1-vs-H2 order custkeys with multiplicity preserved"

  private val mid = "1995-07-01 00:00:00"
  private val end = "1996-01-01 00:00:00"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val h1 = o.filter(col("o_orderdate") < lit(mid).cast("timestamp"))
      .select(col("o_custkey"))
    val h2 = o.filter(col("o_orderdate") >= lit(mid).cast("timestamp") &&
        col("o_orderdate") < lit(end).cast("timestamp"))
      .select(col("o_custkey"))
    h1.exceptAll(h2)
  }

  val oracle = Some(
    s"""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '$mid'
       |EXCEPT ALL
       |SELECT o_custkey FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$mid' AND o_orderdate < TIMESTAMP '$end'""".stripMargin)
}

/** q22: GROUPING SETS — the general form q11's rollup and q18's cube are
  * special cases of: an explicit lattice of aggregation levels, plus
  * `grouping()` flags so a consumer can tell a real NULL group from a
  * subtotal row (the standard disambiguator; this corpus's keys are
  * non-NULL, but the flags are part of the operator's contract). Spark
  * plans one Expand + one hash aggregate — each input row fans out to its
  * participating sets and partial aggregation still collapses per
  * partition; the map-side combine survives, same as rollup/cube.
  */
object Q22GroupingSets extends GraftQuery {
  val name = "q22_grouping_sets"
  val describe = "GROUPING SETS {(flag,status),(flag),(status)} with grouping() flags"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("q22_lineitem")
    // The DataFrame API exposes only rollup/cube; arbitrary set lattices
    // are the SQL surface's job (same Aggregate(Expand) plan underneath).
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
        |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM q22_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))""".stripMargin)
  }

  val oracle = Some(
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) AS TINYINT) AS g_flag,
      |       CAST(grouping(l_linestatus) AS TINYINT) AS g_status,
      |       count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))""".stripMargin)
}

/** q23: analytic rank family over a join — each order ranked inside its
  * customer's market segment by total price: percent_rank (relative
  * position), cume_dist (inclusive CDF), ntile(4) (quartile). One window
  * exchange on the segment key serves all three functions (they share the
  * partition AND the sort); the customer side broadcasts into the join.
  * Top-level filter keeps the output bounded (top decile by percent_rank)
  * without a second window.
  *
  * Determinism: (o_totalprice DESC, o_orderkey ASC) is a total order, so
  * rank positions — and therefore all three analytics — are exact on both
  * engines; percent_rank/cume_dist are single divisions of exact integers.
  */
object Q23WindowRanks extends GraftQuery {
  val name = "q23_window_ranks"
  val describe = "percent_rank/cume_dist/ntile(4) per market segment, top decile"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).as("quartile"))
      .filter(col("pct_rank") <= 0.1)
  }

  val oracle = Some(
    """WITH r AS (
      |  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
      |         round(percent_rank() OVER w, 6) AS pct_rank,
      |         round(cume_dist() OVER w, 6) AS cdist,
      |         CAST(ntile(4) OVER w AS INT) AS quartile
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WINDOW w AS (PARTITION BY c.c_mktsegment
      |               ORDER BY o.o_totalprice DESC, o.o_orderkey ASC))
      |SELECT * FROM r WHERE pct_rank <= 0.1""".stripMargin)
}
