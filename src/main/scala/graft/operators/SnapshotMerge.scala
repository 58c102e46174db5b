package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot MERGE — the change-data-capture upsert between a base snapshot
  * and a delta batch, the incremental-ingestion primitive behind Delta's /
  * Iceberg's `MERGE INTO` and the recrawl cycle of a 100-TB corpus (today's
  * crawl is a delta against yesterday's release; most rows carry over,
  * some update in place, some are new).
  *
  * The reference has no incremental story at all — every guagua run
  * re-reads the full input (worker/AbstractWorkerComputable.java:66-104
  * loads once per JOB, not incrementally across jobs); d8's Bloom gate
  * covers incremental DEDUP, this covers incremental STATE.
  *
  * Shape: ONE full-outer equi-join on the merge key; each output row's
  * disposition falls out of null-ness —
  *   - key in both      → `updated`  (delta wins),
  *   - key in base only → `carried`  (base row survives unchanged),
  *   - key in delta only → `inserted`.
  * Deletes are the caller's convention (a tombstone column in the delta
  * filtered after the merge) — dispositions stay a closed 3-set here.
  *
  * Scale: the join shuffles both sides on the merge key once. At 100 TB the
  * two cheaper regimes are (a) delta ≪ base — broadcast the delta (Spark
  * does this automatically under `autoBroadcastJoinThreshold`; a full-outer
  * join cannot broadcast, so small deltas should instead take the
  * left-anti ∪ inner decomposition) and (b) repeated merges — bucket BOTH
  * snapshots on the key (BucketingSpec's layout) so every nightly merge is
  * co-located with zero shuffle. Hot keys split under AQE skew handling.
  * Nothing here is row-order- or partition-count-sensitive.
  */
object SnapshotMerge {
  /** Merge `delta` into `base` on `key`. `payload` names the columns carried
    * through (present in both inputs); for each, the output holds
    * `coalesce(delta.c, base.c)` — delta wins where both exist. Adds
    * `disposition ∈ {inserted, carried, updated}`.
    */
  def merge(base: DataFrame, delta: DataFrame, key: String, payload: Seq[String]): DataFrame = {
    // Null-ness of a SIDE (not of a payload value) must drive the
    // disposition, so tag each side with a literal marker that survives the
    // outer join: a payload column could legitimately hold nulls.
    val b = base.select((key +: payload).map(col) :+ lit(1).as("__in_base"): _*)
    val d = delta.select((key +: payload).map(col) :+ lit(1).as("__in_delta"): _*)
    val joined = b.alias("b").join(d.alias("d"), Seq(key), "full_outer")
    val disposition = when(col("__in_base").isNull, "inserted")
      .when(col("__in_delta").isNull, "carried")
      .otherwise("updated")
    val merged: Seq[Column] = payload.map(c =>
      coalesce(col(s"d.$c"), col(s"b.$c")).as(c))
    joined.select(col(key) +: merged :+ disposition.as("disposition"): _*)
  }
}
