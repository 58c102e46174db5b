package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** j4: range join — price tiers × lineitem (tier.lo <= price < tier.hi).
  *
  * Implemented with the bin-key technique: map every price to a fixed-width
  * bin, expand each tier to the bins it overlaps, then EQUI-join on the bin
  * and re-check the exact predicate. This turns a non-equi join (which Spark
  * plans as a nested-loop — O(|L|·|R|) compares) into a hash join whose
  * probe work is |L| × (avg tiers per bin ≈ 1): the standard interval-join
  * decomposition that holds at any scale. The tiny tier side still
  * broadcasts; the bin trick is what removes the per-row tier scan.
  */
object J4RangeJoin extends GraftQuery {
  val name = "j4_range_join"
  val describe = "range join lineitem×price-tiers via bin-key equi-join decomposition"

  // (name, lo, hi) — fixed public tier table; hi exclusive.
  private val tiers = Seq(
    ("budget", 900.0, 20000.0),
    ("mid", 20000.0, 60000.0),
    ("premium", 60000.0, 105000.0))
  private val binWidth = 5000.0

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tierDf = tiers.toDF("tier", "lo", "hi")
      .withColumn("bin", explode(sequence(
        floor(col("lo") / binWidth).cast("long"),
        floor((col("hi") - lit(0.001)) / binWidth).cast("long"))))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice").as("price"))
      .withColumn("bin", floor(col("price") / binWidth).cast("long"))
    li.join(broadcast(tierDf), Seq("bin"))
      .filter(col("price") >= col("lo") && col("price") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), round(sum(col("price")), 2).as("sum_price"))
  }

  val oracle = {
    val tierRows = tiers
      .map { case (t, lo, hi) => s"('$t', $lo, $hi)" }.mkString(", ")
    Some(
      s"""WITH tiers(tier, lo, hi) AS (VALUES $tierRows)
         |SELECT tier, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
         |FROM lineitem JOIN tiers
         |  ON l_extendedprice >= lo AND l_extendedprice < hi
         |GROUP BY tier""".stripMargin)
  }
}

/** q15: pivot — per-linestatus columns of per-returnflag counts. Spark's
  * `pivot` compiles to the same conditional-aggregation the oracle spells
  * out (one pass, no shuffle beyond the group-by).
  */
object Q15Pivot extends GraftQuery {
  val name = "q15_pivot"
  val describe = "pivot l_linestatus into per-status count columns"

  private val statuses = Seq("F", "O")

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", statuses)
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("l_returnflag"), col("F").as("cnt_f"), col("O").as("cnt_o"))

  val oracle = Some(
    """SELECT l_returnflag,
      |       CAST(count(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS cnt_f,
      |       CAST(count(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS cnt_o
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin)
}

/** q26: UNPIVOT — q15's inverse: the four lineitem measures melted into
  * long form (key, measure-name, value), the wide→tidy reshape every
  * metrics pipeline runs before a generic per-measure aggregation. Uses
  * Spark's native `Dataset.unpivot` (planned as one Expand over the scan —
  * a projection-only fan-out, no shuffle, no join; at 100 TB the cost is
  * exactly the 4× row fan-out and nothing else). Values pass through
  * untouched (no arithmetic → no rounding discipline needed). The oracle
  * states the operator's algebraic definition as UNION ALL of per-measure
  * projections — a structurally different construction that must agree
  * row-for-row.
  */
object Q26Unpivot extends GraftQuery {
  val name = "q26_unpivot"
  val describe = "UNPIVOT: lineitem measures melted to (key, measure, value) long form via one Expand"

  private val measures = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        measures.map(col).toArray,
        "measure", "value")

  val oracle = Some(
    measures.map(m =>
      s"SELECT l_orderkey, l_linenumber, '$m' AS measure, $m AS value FROM lineitem")
      .mkString("\nUNION ALL\n"))
}

/** q16: distinct aggregates — multiple COUNT(DISTINCT) in one grouped pass
  * (Catalyst plans these via Expand; the reference has no distinct operator
  * at all).
  */
object Q16Distinct extends GraftQuery {
  val name = "q16_distinct"
  val describe = "multiple count(distinct) per group via Expand"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))

  val oracle = Some(
    """SELECT l_returnflag,
      |       count(DISTINCT l_partkey) AS n_parts,
      |       count(DISTINCT l_suppkey) AS n_supps,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin)
}
