package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.SnapshotMerge

/** q25: CDC snapshot merge — [[graft.operators.SnapshotMerge]] applied to a
  * deterministic base/delta pair derived from `orders`: the base snapshot is
  * every order whose hash misses a 1-in-7 carve-out, the delta batch is
  * every 1-in-3 order re-priced +10%, so all three dispositions get mass
  * (inserted = carved-out ∩ re-priced, carried = base-only, updated = both).
  * The output is the full merged snapshot — key, customer, disposition,
  * final price — i.e. exactly what a nightly `MERGE INTO` materializes.
  *
  * Determinism discipline: prices move to an exact integer-cents grid
  * before any arithmetic (`round(x*100)` to integer is the same long on
  * both engines even at a binary midpoint — the Rounding scaladoc argument;
  * the +10% bump is integer `cents + cents div 10`), and the only float in
  * the output is one correctly-rounded division of identical integers.
  * No rounding-order hazard anywhere.
  *
  * Scale: see SnapshotMerge's scaladoc — one keyed shuffle, broadcastable /
  * bucketable in the regimes that matter.
  */
object Q25SnapshotMerge extends GraftQuery {
  val name = "q25_snapshot_merge"
  val describe = "CDC upsert: full-outer snapshot merge with inserted/carried/updated dispositions"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Portable.hash60(concat(lit("snap:"), col("o_orderkey").cast("string")))
    val orders = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      h.as("h"))
    val base = orders.filter(col("h") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("cents"))
    val delta = orders.filter(col("h") % 3 === 0)
      .select(col("o_orderkey"), col("o_custkey"),
        (col("cents") + expr("cents div 10")).as("cents"))
    SnapshotMerge.merge(base, delta, "o_orderkey", Seq("o_custkey", "cents"))
      .select(col("o_orderkey"), col("o_custkey"), col("disposition"),
        (col("cents").cast("double") / 100).as("final_price"))
  }

  val oracle = {
    val h = Portable.hash60Sql("'snap:' || o_orderkey")
    Some(
      s"""WITH o AS (
         |  SELECT o_orderkey, o_custkey,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         |         $h AS h
         |  FROM orders),
         |b AS (SELECT o_orderkey, o_custkey, cents FROM o WHERE h % 7 <> 0),
         |d AS (SELECT o_orderkey, o_custkey, cents + cents // 10 AS cents
         |      FROM o WHERE h % 3 = 0)
         |SELECT coalesce(b.o_orderkey, d.o_orderkey) AS o_orderkey,
         |       coalesce(d.o_custkey, b.o_custkey) AS o_custkey,
         |       CASE WHEN b.o_orderkey IS NULL THEN 'inserted'
         |            WHEN d.o_orderkey IS NULL THEN 'carried'
         |            ELSE 'updated' END AS disposition,
         |       CAST(coalesce(d.cents, b.cents) AS DOUBLE) / 100 AS final_price
         |FROM b FULL OUTER JOIN d ON b.o_orderkey = d.o_orderkey""".stripMargin)
  }
}
