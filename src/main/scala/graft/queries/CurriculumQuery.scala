package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.Rank

/** p18: CURRICULUM ordering — the training-order counterpart of p16's
  * epoch shuffle: instead of one uniform permutation, the corpus is staged
  * easy→hard (length-based curriculum — the standard schedule when no
  * task-specific difficulty model exists: short documents first, the
  * shape curriculum-learning work since Bengio et al. 2009 uses as its
  * canonical axis) with a DETERMINISTIC hash shuffle within each stage, so
  * two runs of the pipeline emit byte-identical training order.
  *
  * Stages are PINNED token-count thresholds (0–31, 32–63, 64–95, ≥ 96
  * tokens → stages 0..3), not quantiles: a quantile split needs a global
  * distribution pass and changes meaning as the corpus grows, while pinned
  * thresholds are stable across incremental releases (p11) and free at any
  * scale. Within a stage, order is `hash60("cur:" + doc_id)` — decorrelated
  * from ingest order, reproducible from the row alone.
  *
  * 100-TB shape: stage assignment is a scan-local projection; the only
  * shuffle is the global position, which rides [[Rank.globalRowNumber]] —
  * range-partition on (stage, hash) + broadcast O(P) offsets, never a
  * single-partition window (the p16/p2 discipline).
  */
object P18Curriculum extends GraftQuery {
  val name = "p18_curriculum"
  val describe = "length-curriculum training order: pinned easy->hard stages, in-stage hash shuffle, exact global positions"

  /** Stage s covers token counts [32·s, 32·(s+1)); the last is open. */
  private[queries] val stageWidth = 32
  private[queries] val nStages = 4

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("stage",
        least(lit((nStages - 1).toLong), expr(s"n_tok div $stageWidth")))
      .withColumn("h",
        Portable.hash60(concat(lit("cur:"), col("doc_id").cast("string"))))
    Rank.globalRowNumber(docs,
        Seq(col("stage"), col("h"), col("doc_id")),
        spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("n_tok"), col("stage"), col("rk").as("position"))
  }

  val oracle = Some(
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(len(${graft.operators.TextOps.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tok,
       |         least(${nStages - 1}, n_tok // $stageWidth) AS stage,
       |         ${Portable.hash60Sql("'cur:' || CAST(doc_id AS VARCHAR)")} AS h
       |  FROM d)
       |SELECT doc_id, n_tok, stage,
       |       CAST(row_number() OVER (ORDER BY stage, h, doc_id) AS BIGINT) AS position
       |FROM s""".stripMargin)
}
