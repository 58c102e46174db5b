package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** t5: string scalar-function battery over `part` — the everyday string
  * library (case, substring, trim, replace, reverse, padding, splitting,
  * edit distance) exercised per row and verified value-for-value against
  * DuckDB. Pure projection: scan-bound, codegen'd, shuffle-free.
  */
object T5StringFuncs extends GraftQuery {
  val name = "t5_string_funcs"
  val describe = "string function battery (case/substr/trim/replace/pad/split/levenshtein)"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir).select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
      length(trim(col("p_name"))).cast("long").as("name_len"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      reverse(col("p_brand")).as("brand_rev"),
      lpad(col("p_size").cast("string"), 5, "0").as("size_padded"),
      split(col("p_type"), " ").getItem(0).as("type_head"),
      levenshtein(col("p_brand"), lit("Brand#33")).cast("long").as("brand_dist"))

  val oracle = Some(
    """SELECT p_partkey,
      |       upper(substr(p_name, 1, 8)) AS name_prefix,
      |       CAST(length(trim(p_name)) AS BIGINT) AS name_len,
      |       replace(p_name, ' ', '_') AS name_snake,
      |       reverse(p_brand) AS brand_rev,
      |       lpad(CAST(p_size AS VARCHAR), 5, '0') AS size_padded,
      |       split_part(p_type, ' ', 1) AS type_head,
      |       CAST(levenshtein(p_brand, 'Brand#33') AS BIGINT) AS brand_dist
      |FROM part""".stripMargin)
}

/** w4: datetime scalar functions over events — formatting, truncation and
  * calendar extraction, normalized to the representations both engines
  * share (ISO strings; 0-based day-of-week, since Spark's `dayofweek` is
  * Sunday=1 while DuckDB's `dow` is Sunday=0).
  */
object W4DateFuncs extends GraftQuery {
  val name = "w4_date_funcs"
  val describe = "datetime battery: day bucketing, 0-based day-of-week, hour extraction"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hr"),
        col("event_type"))
      .groupBy(col("day"), col("dow"), col("hr"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  val oracle = Some(
    """SELECT strftime(ts, '%Y-%m-%d') AS day,
      |       CAST(extract(dow FROM ts) AS BIGINT) AS dow,
      |       CAST(extract(hour FROM ts) AS BIGINT) AS hr,
      |       event_type,
      |       count(*) AS n
      |FROM events
      |GROUP BY 1, 2, 3, 4""".stripMargin)
}

/** q17: data-quality checks — the pre-training corpus gate: row counts,
  * per-column null counts, and domain-violation counts in ONE scan (all
  * checks are conditional aggregates, so adding a check adds zero passes).
  */
object Q17QualityChecks extends GraftQuery {
  val name = "q17_quality_checks"
  val describe = "one-scan data-quality gate: nulls + domain violations over lineitem"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("null_qty"),
      sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L)).as("null_price"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L).otherwise(0L)).as("bad_discount"),
      sum(when(col("l_tax") < 0, 1L).otherwise(0L)).as("bad_tax"),
      sum(when(col("l_shipdate") < lit("1992-01-01 00:00:00").cast("timestamp"), 1L).otherwise(0L)).as("early_shipdate"))

  val oracle = Some(
    """SELECT count(*) AS n_rows,
      |       CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
      |       CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
      |       CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
      |       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount,
      |       CAST(sum(CASE WHEN l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_tax,
      |       CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01 00:00:00' THEN 1 ELSE 0 END) AS BIGINT) AS early_shipdate
      |FROM lineitem""".stripMargin)
}
