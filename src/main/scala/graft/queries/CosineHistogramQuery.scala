package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** d12: full pairwise-cosine histogram — the threshold-calibration report
  * behind d5/d10 (and any dedup threshold choice): how many vector pairs
  * fall in each 0.05-wide cosine bucket, over ALL n·(n−1)/2 pairs, with no
  * pair ever materialized. Deciding "is 0.35 the right near-dup cut?"
  * requires exactly this table, and at corpus scale it must come out of the
  * same tiled pass d5 uses — the histogram is the fold's state (41 counters
  * per tile), so shuffle volume is O(N·B) replicated vectors in and
  * O(tiles × buckets) counter rows out, nothing in between.
  *
  * Determinism: per-pair cosine accumulates left-to-right over the same
  * normalized doubles as d5 (IEEE-exact, bit-identical to the oracle's
  * unrolled SQL); the bucket is floor(round(cos,6)·20) computed in doubles
  * on both sides, so boundary pairs land identically. Counts are exact
  * integers — nothing float-valued reaches the hash gate.
  */
object D12CosineHistogram extends GraftQuery {
  val name = "d12_cosine_histogram"
  val describe = "pairwise cosine histogram (0.05 buckets, all pairs, tile-local counters)"

  private val d = Embeddings.dims
  private val B = D5EmbedDedup.defaultBlocks

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ed"),
      VectorOps.norm(col("embedding"), d).as("nrm"))
      .as[(Long, Array[Double], Double)]
    base
      .flatMap { case (id, arr, nrm) =>
        val en = arr.map(_ / nrm)
        val b = (id % B).toInt
        (0 until B).iterator.map { o =>
          val (i, j) = if (o < b) (o, b) else (b, o)
          (i * B + j, b, id, en)
        }
      }
      .groupByKey(_._1)
      .flatMapGroups { (tile: Int, rows: Iterator[(Int, Int, Long, Array[Double])]) =>
        val i = tile / B
        val j = tile % B
        def dot(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0
          var x = 0
          while (x < a.length) { s += a(x) * b(x); x += 1 }
          s
        }
        // cos ∈ [−1, 1] → floor(round(cos,6)·20) ∈ [−20, 20]: 41 counters.
        val counts = new Array[Long](41)
        def add(cos: Double): Unit = {
          val bkt = math.floor(graft.functions.Rounding.roundTo(cos, 6) * 20).toInt
          counts(bkt + 20) += 1
        }
        if (i == j) {
          val vs = rows.map(r => (r._3, r._4)).toArray
          for {
            ai <- vs.indices
            bi <- ai + 1 until vs.length
          } add(dot(vs(ai)._2, vs(bi)._2))
        } else {
          val left = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
          val right = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
          rows.foreach { case (_, b, _, en) =>
            (if (b == i) left else right) += en
          }
          for (va <- left; vb <- right) add(dot(va, vb))
        }
        counts.iterator.zipWithIndex
          .collect { case (c, idx) if c > 0 => (idx - 20, c) }
      }
      .toDF("bucket", "npairs")
      .groupBy(col("bucket")).agg(sum(col("npairs")).as("npairs"))
  }

  /** Same 0.05 bucketing over a provided pair frame carrying a `cosine`
    * column (e.g. d16's LSH-verified pairs) — the candidate-set calibration
    * view for when the full census is run on a sample but the production
    * candidate distribution still needs monitoring. The parameterless run
    * stays ALL-pairs by design: that census is the tool's purpose.
    */
  def histogramOverPairs(pairs: DataFrame): DataFrame =
    pairs
      .select(floor(round(col("cosine"), 6) * 20).cast("int").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("npairs"))

  val oracle = {
    val en = s"list_transform(embedding, x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding", d)})"
    val dot = (0 until d).map(i => s"a.en[${i + 1}] * b.en[${i + 1}]").mkString(" + ")
    Some(
      s"""WITH e AS (SELECT vec_id, $en AS en FROM embeddings),
         |p AS (
         |  SELECT CAST(floor(round($dot, 6) * 20) AS INT) AS bucket
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT bucket, count(*) AS npairs FROM p GROUP BY bucket""".stripMargin)
  }
}
