package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, PartitioningCollection}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Lineage truncation that PRESERVES the physical plan's output
  * partitioning — `Dataset.checkpoint`'s construction with `persist`
  * substituted for the checkpoint.
  *
  * Why it exists (optimization round 16, guide §2.4, VERDICT r15 #3): the
  * iterative engines (ConnectedComponents' label loop) must truncate the
  * Catalyst plan every round or it embeds all prior rounds; the round-14
  * form did that through `df.rdd` + `createDataFrame(rdd, schema)`, which
  * cuts the lineage but ERASES the partitioning — Catalyst sees an opaque
  * scan, so the next round's `labels ⨝ cand ON node` re-shuffled the ENTIRE
  * label table every round even though it was already hash-partitioned by
  * node. `localCheckpoint` would preserve the partitioning (it wraps the
  * executed RDD in a [[LogicalRDD]] carrying `outputPartitioning`) but
  * sacrifices recomputability on executor loss. This helper does exactly
  * what `Dataset.checkpoint` does — execute the physical plan, wrap the
  * InternalRow RDD in a [[LogicalRDD]] via the same `fromDataset` rewrite
  * (which maps the physical partitioning/ordering expressions onto the new
  * plan's attributes) — but persists the RDD instead of checkpointing it,
  * so the lineage (and with it recomputability) survives while the
  * planner keeps seeing `HashPartitioning(node)`.
  *
  * The `.map(_.copy())` is load-bearing: operators reuse UnsafeRow buffers,
  * so persisting the raw iterator would alias every row in a partition to
  * the last buffer state.
  */
object PersistedTruncate {

  /** Execute `df`, persist its rows at `level`, and return a DataFrame over
    * the persisted RDD that still advertises the plan's output partitioning
    * plus the RDD handle for precise unpersist.
    *
    * Deliberately NOT `LogicalRDD.fromDataset`: that helper forwards the
    * ORIGIN plan's statistics into the new leaf, so an iterative caller's
    * size estimates COMPOUND round over round (each round's join multiplies
    * the forwarded products — by round ~8 the BigInt sizeInBytes has
    * millions of digits and `SizeInBytesOnlyStatsPlanVisitor` spends
    * unbounded time in BigInteger.multiply; observed as a planner hang on
    * the d7 warmup). Constructing the [[LogicalRDD]] with
    * `originStats = None` resets each round to `defaultSizeInBytes` —
    * exactly the stats behavior of the `createDataFrame(rdd, schema)`
    * boundary this replaces — while keeping the partitioning.
    */
  def truncate(df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, RDD[InternalRow]) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = ds.sparkSession
    // Under AQE the executedPlan is AdaptiveSparkPlanExec — a LeafExecNode
    // that does NOT override outputPartitioning (it reports the default
    // UnknownPartitioning even after finalization; Dataset.checkpoint has
    // the same blind spot). execute() finalizes the adaptive plan — the
    // intermediate shuffle stages materialize here, as they already did
    // for the old df.rdd boundary — and the partitioning must then be
    // read from the FINAL physical plan inside it.
    val physical = ds.queryExecution.executedPlan
    val internal = physical.execute().map(_.copy()).persist(level)
    val finalPlan = physical match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // Dataset.checkpoint's firstLeafPartitioning: a join's output reports a
    // PartitioningCollection; the leaf is the one the new plan can claim.
    def firstLeaf(p: Partitioning): Partitioning = p match {
      case c: PartitioningCollection => firstLeaf(c.partitionings.head)
      case other => other
    }
    val logical = LogicalRDD(
      ds.logicalPlan.output,
      internal,
      firstLeaf(finalPlan.outputPartitioning),
      finalPlan.outputOrdering,
      isStreaming = false,
      stream = None)(spark, None, None)
    (org.apache.spark.sql.classic.Dataset.ofRows(spark, logical), internal)
  }
}
