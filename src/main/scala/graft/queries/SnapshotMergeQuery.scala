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

/** q27: FULL CDC merge — [[graft.operators.SnapshotMerge.mergeCdc]]'s closed
  * 4-set over the same `orders` derivation as q25, now with the two CDC
  * semantics q25's 3-set cannot express:
  *
  *   - TOMBSTONES: delta rows with h%5 == 0 are deletes. A tombstone whose
  *     key is in the base yields `disposition = deleted` (carrying the
  *     base's last-known payload); a tombstone for an absent key (h%7 == 0 ∩
  *     h%5 == 0) is a no-op dropped from the output — both branches have
  *     corpus mass under the carve-out algebra.
  *   - DELTA-SETS-NULL: update rows assign `o_custkey` only when h%2 == 0
  *     (`o_custkey_set`), and the assigned value is NULL when h%4 == 0 — the
  *     case plain `coalesce` would silently resurrect the base value for.
  *     The other half (h%2 == 1) leaves `o_custkey` unset: base value
  *     carries; NULL for inserted keys. `cents` has no presence column —
  *     exercising the "missing c_set means always assigned" default.
  *
  * So one query pins all four dispositions, the no-op-delete drop, per-column
  * presence, set-to-NULL, set-to-value, and unset-carry — each with
  * differentiating mass under the hash gate.
  *
  * Scale: identical to q25 — ONE full-outer keyed join (see SnapshotMerge's
  * scaladoc for the broadcast/bucketing regimes); the presence flags ride
  * the same join as ordinary columns, zero extra shuffles.
  */
object Q27CdcMergeFull extends GraftQuery {
  val name = "q27_cdc_merge_full"
  val describe = "full CDC merge: tombstone deletes + per-column presence (delta-sets-NULL)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Portable.hash60(concat(lit("snap:"), col("o_orderkey").cast("string")))
    val orders = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      h.as("h"))
    val base = orders.filter(col("h") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("cents"))
    val delta = orders.filter(col("h") % 3 === 0).select(
      col("o_orderkey"),
      when(col("h") % 4 === 0, lit(null).cast("long"))
        .otherwise(col("o_custkey") + lit(1000000L)).as("o_custkey"),
      (col("h") % 2 === 0).as("o_custkey_set"),
      (col("cents") + expr("cents div 10")).as("cents"),
      (col("h") % 5 === 0).as("deleted"))
    graft.operators.SnapshotMerge
      .mergeCdc(base, delta, "o_orderkey", Seq("o_custkey", "cents"))
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
         |cb AS (SELECT o_orderkey, o_custkey, cents FROM o WHERE h % 7 <> 0),
         |cd AS (SELECT o_orderkey,
         |              CASE WHEN h % 4 = 0 THEN NULL
         |                   ELSE o_custkey + 1000000 END AS custkey_new,
         |              h % 2 = 0 AS custkey_set,
         |              cents + cents // 10 AS cents_new,
         |              h % 5 = 0 AS tomb
         |       FROM o WHERE h % 3 = 0),
         |j AS (SELECT coalesce(cb.o_orderkey, cd.o_orderkey) AS o_orderkey,
         |             cb.o_orderkey IS NOT NULL AS in_base,
         |             cd.o_orderkey IS NOT NULL AS in_delta,
         |             cd.tomb, cd.custkey_set, cd.custkey_new, cd.cents_new,
         |             cb.o_custkey AS custkey_base, cb.cents AS cents_base
         |      FROM cb FULL OUTER JOIN cd ON cb.o_orderkey = cd.o_orderkey)
         |SELECT o_orderkey,
         |       CASE WHEN in_delta AND NOT tomb AND custkey_set
         |            THEN custkey_new ELSE custkey_base END AS o_custkey,
         |       CASE WHEN NOT in_base THEN 'inserted'
         |            WHEN NOT in_delta THEN 'carried'
         |            WHEN tomb THEN 'deleted'
         |            ELSE 'updated' END AS disposition,
         |       CAST(CASE WHEN in_delta AND NOT tomb THEN cents_new
         |                 ELSE cents_base END AS DOUBLE) / 100 AS final_price
         |FROM j
         |WHERE NOT (NOT in_base AND tomb)""".stripMargin)
  }
}
