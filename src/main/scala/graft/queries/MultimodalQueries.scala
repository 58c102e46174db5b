package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** m1: multimodal metadata extraction, declarative path — binary payload
  * sizes plus hash-derived fake media dimensions (the oracle-checkable twin
  * of [[graft.operators.Multimodal]]'s mapPartitions decode; the decode stub
  * itself is exercised in MultimodalSpec since DuckDB can't run it).
  *
  * The point under test: binary-column handling (string→blob cast,
  * octet_length) agrees between engines, and metadata derivation is a pure
  * projection that never shuffles.
  */
object M1MultimodalMeta extends GraftQuery {
  val name = "m1_multimodal_meta"
  val describe = "binary payload metadata: sizes + deterministic fake decode dimensions"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Portable.hash60(concat(lit("m:"), col("text")))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      (lit(16) + pmod(h, lit(1024L))).cast("int").as("width"),
      (lit(16) + pmod(shiftright(h, 10), lit(1024L))).cast("int").as("height"),
      (lit(1) + pmod(shiftright(h, 20), lit(16L))).cast("int").as("n_frames"))
  }

  val oracle = {
    val h = Portable.hash60Sql("'m:' || text")
    Some(
      s"""WITH t AS (SELECT doc_id, text, $h AS h FROM documents)
         |SELECT doc_id,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       CAST(16 + h % 1024 AS INT) AS width,
         |       CAST(16 + (h >> 10) % 1024 AS INT) AS height,
         |       CAST(1 + (h >> 20) % 16 AS INT) AS n_frames
         |FROM t""".stripMargin)
  }
}

/** m2: frame sampling + resize over the binary payload column — the
  * video-shaped half of the multimodal surface ([[graft.operators.Multimodal
  * .sampleFrames]]): every 2nd "frame" chunk of each payload, downscaled 4×,
  * emitted as (doc_id, frame_idx, n_bytes). The decode/chunk stub runs
  * inside a typed `mapPartitions` flatMap, so this op is NOT SQL-expressible
  * and carries no DuckDB oracle — the driver records the rows-only check,
  * and MultimodalSpec pins the per-doc frame counts and determinism.
  *
  * Scale: flatMap fan-out happens executor-side after columnar pruning has
  * already limited the scan to (doc_id, payload); output partitioning
  * follows the input, no shuffle.
  */
object M2FrameSample extends GraftQuery {
  val name = "m2_frame_sample"
  val describe = "payload frame sampling (stride 2) + 4x resize stub; rows-only check"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    Multimodal.sampleFrames(
      Multimodal.attachPayload(Tables.documents(spark, sfDir)).as[Multimodal.MediaRecord])
      .select(col("doc_id"), col("frame_idx"), col("n_bytes"))
  }

  val oracle = None
}
