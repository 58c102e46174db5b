package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** Embedding dimensionality of the test tables (embeddings.embedding). */
private[queries] object Embeddings {
  val dims = 64
}

/** d5: embedding-cosine similar-pair mining (cos ≥ 0.35 — the top ~0.1%
  * tail of this embedding space, whose max off-diagonal cosine is 0.51),
  * brute-force all-pairs — the correctness baseline the LSH path (s2)
  * approximates.
  *
  * Implementation: vectors are L2-normalized declaratively, then the pair
  * sweep runs as typed `mapPartitions` against a broadcast of the normalized
  * matrix — the one place the declarative form genuinely loses: a pair JOIN
  * materializes n²/2 rows each carrying two 64-double arrays (~80 s at
  * sf0.1) while the partition loop over the broadcast does the identical
  * arithmetic in 0.8 s. At corpus scale this becomes tiled block-pairs
  * (broadcast one tile, stream the other) — the columnSimilarities shape.
  *
  * Determinism: the inner loop accumulates left-to-right over the same
  * normalized doubles the oracle's unrolled SQL uses — products and sums are
  * IEEE-exact, so the pair sets match bit-for-bit.
  */
object D5EmbedDedup extends GraftQuery {
  val name = "d5_embed_dup"
  val describe = "embedding cosine >= 0.35 similar pairs, brute force (LSH scale path = s2)"

  private val threshold = 0.35
  private val d = Embeddings.dims

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Norm is computed as its own column and the division happens in Scala
    // after collect: a `transform(e, x => x / normExpr)` lambda would
    // re-evaluate the captured 64-term norm PER ELEMENT (the Catalyst
    // HOF-capture trap documented on TextOps.shingles). Same IEEE division,
    // same values, one norm per row.
    val collected = Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ed"),
      VectorOps.norm(col("embedding"), d).as("nrm"))
      .as[(Long, Array[Double], Double)].collect()
    val vecs = collected.map { case (id, arr, n) => (id, arr.map(_ / n)) }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(vecs)
    val nPart = spark.sparkContext.defaultParallelism
    val t = threshold
    spark.createDataset(vecs.map(_._1).toSeq).repartition(nPart)
      .mapPartitions { ids =>
        val all = bc.value
        val byId = all.toMap
        ids.flatMap { ida =>
          val va = byId(ida)
          all.iterator.filter(_._1 > ida).map { case (idb, vb) =>
            var s = 0.0
            var i = 0
            while (i < va.length) { s += va(i) * vb(i); i += 1 }
            (ida, idb, s)
          }.filter(_._3 >= t)
        }
      }
      .toDF("vec_a", "vec_b", "cos")
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val en = s"list_transform(embedding, x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding", d)})"
    val dot = (0 until d).map(i => s"a.en[${i + 1}] * b.en[${i + 1}]").mkString(" + ")
    Some(
      s"""WITH e AS (SELECT vec_id, $en AS en FROM embeddings)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($dot, 6) AS cosine
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE $dot >= $threshold""".stripMargin)
  }
}

/** s1: brute-force cosine top-k neighbours for a pinned query set — the
  * exact-ANN baseline. Ranking windows partition by query, so the sort is
  * per-query over its candidate list, never global. Ties broken by
  * neighbour id; similarities are bit-identical across engines (unrolled
  * IEEE arithmetic), so ranks are too.
  */
object S1AnnBrute extends GraftQuery {
  val name = "s1_ann_brute"
  val describe = "exact cosine top-10 neighbours for query vectors (vec_id < 5)"

  private val k = 10
  private val nQueries = 5
  private val d = Embeddings.dims

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < nQueries)
    // Native codegen'd expression; bit-identical to the oracle's unrolled
    // per-dimension arithmetic (see o.a.s.sql.graft.CosineSimilarity).
    val cos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("q.embedding"), col("n.embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    q.alias("q")
      .join(e.alias("n"), col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val cos = s"(${VectorOps.dotSql("q.embedding", "n.embedding", d)}) / (q.nrm * n.nrm)"
    Some(
      s"""WITH e AS (SELECT vec_id, embedding, ${VectorOps.normSql("embedding", d)} AS nrm FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < $nQueries),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cos AS cos
         |  FROM q JOIN e n ON q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
         |FROM ranked WHERE rank <= $k""".stripMargin)
  }
}

/** s2: sign-LSH bucketed approximate nearest neighbours — the scale path.
  * Seeded hyperplanes hash every vector to a bucket id; candidates are
  * same-bucket only, so the join cost is Σ bucket² instead of n². Recall is
  * traded for the pinned seed's bucket geometry; both engines compute the
  * identical buckets from the identical inlined plane constants. Plane
  * count sets the partition granularity: 4 planes → 16 buckets sized for
  * this corpus (more planes at corpus scale, or multiple hash tables for
  * recall).
  */
object S2AnnLsh extends GraftQuery {
  val name = "s2_ann_lsh"
  val describe = "sign-LSH (4 planes) bucketed cosine top-10 for query vectors"

  private val k = 10
  private val nQueries = 5
  private val d = Embeddings.dims
  private val planes = VectorOps.hyperplanes(nPlanes = 4, d = d, seed = 42L)

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir).select(
      col("vec_id"), col("embedding"),
      VectorOps.lshBucket(col("embedding"), planes).as("bucket"))
    val q = e.filter(col("vec_id") < nQueries)
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val cos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("q.embedding"), col("n.embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    q.alias("q")
      .join(e.alias("n"),
        col("q.bucket") === col("n.bucket") && col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val bucket = VectorOps.lshBucketSql("embedding", planes)
    val cos = s"(${VectorOps.dotSql("q.embedding", "n.embedding", d)}) / (q.nrm * n.nrm)"
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${VectorOps.normSql("embedding", d)} AS nrm,
         |         CAST($bucket AS BIGINT) AS bucket
         |  FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id < $nQueries),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cos AS cos
         |  FROM q JOIN e n ON q.bucket = n.bucket AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
         |FROM ranked WHERE rank <= $k""".stripMargin)
  }
}
