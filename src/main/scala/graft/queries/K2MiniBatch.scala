package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.KMeans.sqlLit

/** k2: MINI-BATCH stochastic gradient descent — k1's other half: instead of
  * one full-corpus gradient per step, each step averages the gradient over
  * a deterministic hash-selected quarter of the rows (the reference's C4
  * semantics with the per-iteration data subset every production SGD run
  * uses; the hash batches replace RNG sampling per the engine's q10/s3
  * seeded-hash discipline — recomputable from the row alone, so a retry or
  * a different partitioning sees the same batch).
  *
  * 8 steps cycling over 4 batches over a ONCE-materialized training matrix
  * (batch id + 5 feature columns, one md5 per row total); each step filters
  * the cached frame on its batch id (at scale a batch-bucketed persisted
  * layout turns the same predicate into partition pruning) and runs one
  * codegen'd gradient aggregate; the driver fold is O(dims). Determinism follows k1's
  * contract: per-step gradients and weights round to 6 decimals on both
  * sides, lr = 1.0 keeps updates on the rounding grid.
  */
object K2MiniBatchSgd extends GraftQuery {
  val name = "k2_minibatch_sgd"
  val describe = "mini-batch SGD: 8 steps over 4 deterministic hash batches, unrolled-CTE oracle"

  private val steps = 8
  private val nBatches = 4
  private val lr = 1.0
  private val w0 = Seq(0.0, 0.0, 0.0, 0.0, 0.0)
  private val dims = w0.length

  private val rowHash =
    Portable.hash60(concat(col("l_orderkey").cast("string"), lit(":"), col("l_linenumber").cast("string")))
  private def rowHashSql =
    Portable.hash60Sql("CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)")

  private def round6(x: Double): Double = graft.functions.Rounding.roundTo(x, 6)

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import LineitemFeatures._
    // Materialize the training matrix ONCE: the batch id costs one md5 per
    // row total (not per step), and the 8 step scans read a 6-column cached
    // frame instead of re-decoding parquet. This is the standard "project
    // the feature matrix before the epoch loop" move — at corpus scale the
    // same projection is what a batch-bucketed layout persists, and the
    // epoch loop reads whatever tier it fits in (memory here, disk there).
    // Bench/Verify sweep the cache after the query; library callers get
    // runManaged.
    // sortWithinPartitions("bat") before the persist (round 15): the cached
    // columnar batches then carry tight min/max stats on `bat`, so each
    // step's `bat === batch` filter prunes ~3/4 of the in-memory batches at
    // the stats check instead of decompressing and scanning them
    // (spark.sql.inMemoryColumnarStorage.partitionPruning). No shuffle — a
    // per-partition sort of the projection — and row content is unchanged,
    // so every step's aggregate sees exactly the same batch rows. CAVEAT
    // (round 16, ADVICE r15): "same rows" is not "same result" for a plain
    // double sum — the sort changes intra-partition SUMMATION ORDER, and a
    // ulp shift could in principle flip round(…, 6) at a grid midpoint
    // (the t17 failure mode Rounding.exactAvg exists for). That order
    // sensitivity is ACCEPTED here and covered by the oracle hash gate,
    // which has stayed green across the change; routing the gradient
    // through exactAvg would pin it structurally if it ever flips.
    val proj = graft.CacheScope.persisted(
      Tables.lineitem(spark, sfDir).select(
        pmod(rowHash, lit(nBatches.toLong)).as("bat"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"))
        .sortWithinPartitions(col("bat")))
    var w = w0
    for (step <- 1 to graft.core.IterationBudget.effective(steps)) {
      val batch = (step - 1) % nBatches
      val err = sigmoidResidual(zExpr(w))
      val aggs = gradCols.zipWithIndex.map { case (f, j) =>
        round(sum(err * f) / count(lit(1)), 6).as(s"g$j")
      }
      val row = proj.filter(col("bat") === batch)
        .agg(aggs.head, aggs.tail: _*).collect()(0)
      w = w.zipWithIndex.map { case (wi, j) => round6(wi - lr * row.getDouble(j)) }
    }
    import spark.implicits._
    Seq((w(0), w(1), w(2), w(3), w(4)))
      .toDF("w0", "w1", "w2", "w3", "w4")
  }

  val oracle = {
    import LineitemFeatures._
    val sb = new StringBuilder
    sb ++= s"WITH lh AS (SELECT *, $rowHashSql % $nBatches AS bat FROM lineitem),\n"
    sb ++= s"w0(${(0 until dims).map(i => s"w$i").mkString(", ")}) AS (VALUES (${w0.map(sqlLit).mkString(", ")}))"
    for (step <- 1 to steps) {
      val batch = (step - 1) % nBatches
      val err = sigmoidResidualSql(zSql((0 until dims).map(j => s"w.w$j")))
      val gCols = gradSql.zipWithIndex
        .map { case (f, j) => s"round(sum(($err) * $f) / count(*), 6) AS g$j" }
        .mkString(", ")
      sb ++= s",\ng$step AS (SELECT $gCols FROM lh CROSS JOIN w${step - 1} w WHERE lh.bat = $batch)"
      val wCols = (0 until dims)
        .map(j => s"round(w.w$j - ${sqlLit(lr)} * g.g$j, 6) AS w$j").mkString(", ")
      sb ++= s",\nw$step AS (SELECT $wCols FROM w${step - 1} w CROSS JOIN g$step g)"
    }
    sb ++= s"\nSELECT ${(0 until dims).map(i => s"w$i").mkString(", ")} FROM w$steps"
    Some(sb.toString)
  }
}
