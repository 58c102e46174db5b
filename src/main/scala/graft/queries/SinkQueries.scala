package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Q8 (SURVEY §2.F): projection + filter + tagged parquet sink, round-tripped
  * — the reference's per-worker tagged-data dump
  * (kmeans/KMeansDataOutput.java:36-71) re-expressed as a distributed
  * columnar write instead of per-task side files.
  *
  * The filter and 3-column projection are pushed into the scan
  * (PushedFilters/ReadSchema in explain); the write is executor-parallel.
  * The oracle checks the data that came BACK from parquet, so the
  * round-trip itself (types, timestamp encoding) is under test.
  */
object Q8TaggedSink extends GraftQuery {
  val name = "q8_tagged_sink"
  val describe = "filter + projection + tagged parquet sink, round-tripped (B6 sink)"

  private val cutoff = "1995-06-01 00:00:00"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_q8_sink").toString
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(cutoff).cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        concat(
          when(col("l_quantity") >= 25, "H").otherwise("L"),
          when(col("l_discount") >= 0.05, "D").otherwise("N")).as("tag"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  val oracle = Some(
    s"""SELECT l_orderkey, l_linenumber,
       |       (CASE WHEN l_quantity >= 25 THEN 'H' ELSE 'L' END ||
       |        CASE WHEN l_discount >= 0.05 THEN 'D' ELSE 'N' END) AS tag
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$cutoff'""".stripMargin)
}
