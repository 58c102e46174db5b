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
  * exact all-pairs via TILED block-pairs — the correctness baseline the LSH
  * path (s2) approximates.
  *
  * Tiling: vectors are hashed into B blocks on vec_id; each vector is
  * replicated to the B tiles its block participates in (tile (i,j), i ≤ j),
  * and each tile computes its two blocks' cross-pairs in a typed group
  * fold. Nothing is collected to the driver: shuffle volume is N·B rows and
  * per-tile working memory is two blocks (~2N/B vectors) — B is the knob
  * that trades shuffle volume against tile memory, so at corpus scale B
  * grows until a tile fits an executor (the columnSimilarities / block-outer
  * -product shape). The declarative pair JOIN alternative materializes
  * n²/2 rows each carrying two 64-double arrays — measured ~100× slower at
  * sf0.1 than the in-memory loop this uses.
  *
  * Determinism: the inner loop accumulates left-to-right over the same
  * normalized doubles the oracle's unrolled SQL uses — products and sums are
  * IEEE-exact, so the pair sets match bit-for-bit. Normalization happens in
  * Scala per row (same x/nrm the oracle computes once per element; dividing
  * inside a Catalyst lambda would re-evaluate the captured 64-term norm per
  * element — the HOF-capture trap documented on TextOps.shingles).
  */
object D5EmbedDedup extends GraftQuery {
  override val oracleOnly = true // scale twin: d16_semantic_lsh (sign-LSH bucketed candidates)
  val name = "d5_embed_dup"
  val describe = "embedding cosine >= 0.35 similar pairs, exact tiled block-pairs (LSH scale path = s2)"

  private[queries] val threshold = 0.35
  private val d = Embeddings.dims

  /** Default block count for the test scales (8 blocks → 36 tiles, each
    * holding ~2N/8 vectors). At corpus scale, compute it with [[blocksFor]]
    * and pass it to [[run]] — the scale-up is an argument, not an edit.
    */
  val defaultBlocks = 8

  /** Sizing rule for the block count: a tile holds vectors from two blocks
    * (~2N/B of them) and must fit one task's memory, so
    * B = ceil(2·N·bytesPerVector / tileMemoryBudget). Shuffled bytes grow
    * linearly in B (each vector is replicated to B tiles) while per-tile
    * memory shrinks as 1/B — pick the smallest B that fits the budget.
    * E.g. 1B vectors × 512 B at a 1 GiB tile budget → B ≈ 954.
    */
  def blocksFor(corpusVectors: Long, bytesPerVector: Long, tileMemoryBudget: Long): Int =
    math.max(1, math.ceil(2.0 * corpusVectors * bytesPerVector / tileMemoryBudget).toInt)

  def run(spark: SparkSession, sfDir: String): DataFrame =
    // Shared stage output: d10/g1/g2 all consume the exact pair list as
    // their edge source (the oracleOnly recall-oracle family).
    graft.Materialize.table(spark, "d5_pairs", sfDir)(
      run(spark, sfDir, defaultBlocks))

  def run(spark: SparkSession, sfDir: String, blocks: Int): DataFrame = {
    import spark.implicits._
    require(blocks >= 1, s"blocks must be >= 1, got $blocks")
    val B = blocks
    val t = threshold
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
        if (i == j) {
          // Diagonal tile: each vector appears once; all pairs id_a < id_b.
          val vs = rows.map(r => (r._3, r._4)).toArray
          for {
            ai <- vs.indices.iterator
            bi <- (ai + 1 until vs.length).iterator
            (ida, va) = vs(ai)
            (idb, vb) = vs(bi)
            s = dot(va, vb)
            if s >= t
          } yield if (ida < idb) (ida, idb, s) else (idb, ida, s)
        } else {
          // Off-diagonal tile: cross-pairs between the two blocks only.
          val left = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
          val right = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
          rows.foreach { case (_, b, id, en) =>
            (if (b == i) left else right) += ((id, en))
          }
          for {
            (ida, va) <- left.iterator
            (idb, vb) <- right.iterator
            s = dot(va, vb)
            if s >= t
          } yield if (ida < idb) (ida, idb, s) else (idb, ida, s)
        }
      }
      .toDF("vec_a", "vec_b", "cos")
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  /** CTE chain `e, d5` (d5 = the similar-pair set) for reuse by dependent
    * oracles (d10's semantic clusters), mirroring d4's pairsCtesSql shape.
    */
  private[queries] val pairsCtesSql: String = {
    val en = s"list_transform(embedding, x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding", d)})"
    val dot = (0 until d).map(i => s"a.en[${i + 1}] * b.en[${i + 1}]").mkString(" + ")
    s"""e AS (SELECT vec_id, $en AS en FROM embeddings),
       |d5 AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round($dot, 6) AS cosine
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id
       |  WHERE $dot >= $threshold)""".stripMargin
  }

  val oracle = Some(
    s"""WITH $pairsCtesSql
       |SELECT vec_a, vec_b, cosine FROM d5""".stripMargin)
}

/** s1: brute-force cosine top-k neighbours for a pinned query set — the
  * exact-ANN baseline. Ranking windows partition by query, so the sort is
  * per-query over its candidate list, never global. Ties broken by
  * neighbour id; similarities are bit-identical across engines (unrolled
  * IEEE arithmetic), so ranks are too.
  */
object S1AnnBrute extends GraftQuery {
  override val oracleOnly = true // scale twin: s2/s4-s9 (LSH/IVF/PQ bucketed ladder)
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
  * Three independent hash tables (4 seeded hyperplanes each → 16 buckets)
  * with radius-1 multi-probe on the query side: a query probes its own
  * bucket plus the 4 single-bit-flip neighbours in every table, and a
  * candidate is any vector sharing a probed bucket in any table. This is
  * the standard L-tables + multi-probe construction (public LSH literature)
  * that buys recall without the single-table trap: one 4-plane table's
  * recall on this corpus's ~70°-apart top-10 neighbours is p⁴ ≈ 0.14
  * (p ≈ 0.61 per-plane agreement), while 3 tables × 5 probes measures
  * 0.84 (floor 0.75 pinned in AnnRecallSpec).
  *
  * Cost model at scale: data side is written L× (one row per table);
  * candidates per query ≈ L · (probes/2^planes) · n — plane count grows
  * with the corpus to keep buckets bounded, tables/probes set recall.
  * Both engines compute identical buckets from identical inlined plane
  * constants, so the oracle reproduces the exact candidate sets.
  */
object S2AnnLsh extends GraftQuery {
  val name = "s2_ann_lsh"
  val describe = "sign-LSH ANN: 3 tables x 4 planes, radius-1 multi-probe, cosine top-10"

  private val k = 10
  private val nQueries = 5
  private val d = Embeddings.dims
  private val nPlanes = 4
  private val tableSeeds = Seq(42L, 1042L, 2042L)
  private val tables = tableSeeds.map(s => VectorOps.hyperplanes(nPlanes, d, s))

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.graft.DotProduct.register(spark)
    val e = Tables.embeddings(spark, sfDir).select(
      col("vec_id") +: col("embedding") +:
        tables.zipWithIndex.map { case (p, t) =>
          VectorOps.lshBucketFused(col("embedding"), p).as(s"b$t")
        }: _*)
    val tb = explode(array(tables.indices.map(t =>
      struct(lit(t).as("t"), col(s"b$t").as("bucket"))): _*)).as("tb")
    val nLong = e.select(col("vec_id"), col("embedding"), tb)
      .select(col("vec_id"), col("embedding"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val probes = explode(array(
      col("bucket") +: (0 until nPlanes).map(i => col("bucket").bitwiseXOR(lit(1L << i))): _*))
    val qLong = nLong.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), col("t"), probes.as("probe"))
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val cos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("q.embedding"), col("n.embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    qLong.alias("q")
      .join(nLong.alias("n"),
        col("q.t") === col("n.t") && col("q.probe") === col("n.bucket") &&
          col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"), cos.as("cos"))
      .distinct() // a pair can collide in several tables/probes
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val cos = s"(${VectorOps.dotSql("q.embedding", "n.embedding", d)}) / (q.nrm * n.nrm)"
    val bucketCols = tables.zipWithIndex
      .map { case (p, t) => s"CAST(${VectorOps.lshBucketSql("embedding", p)} AS BIGINT) AS b$t" }
      .mkString(",\n         ")
    val nl = tables.indices
      .map(t => s"SELECT vec_id, embedding, nrm, $t AS t, b$t AS bucket FROM e")
      .mkString("\n  UNION ALL ")
    val probeList = ("bucket" +: (0 until nPlanes).map(i => s"xor(bucket, ${1L << i})")).mkString(", ")
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${VectorOps.normSql("embedding", d)} AS nrm,
         |         $bucketCols
         |  FROM embeddings),
         |nl AS (
         |  $nl
         |),
         |ql AS (
         |  SELECT vec_id, embedding, nrm, t, unnest([$probeList]) AS probe
         |  FROM nl WHERE vec_id < $nQueries),
         |scored AS (
         |  SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id, $cos AS cos
         |  FROM ql q JOIN nl n
         |    ON q.t = n.t AND q.probe = n.bucket AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
         |FROM ranked WHERE rank <= $k""".stripMargin)
  }
}

/** s4: IVF (inverted-file) approximate nearest neighbours — the
  * coarse-quantizer scale path the LSH family (s2) complements. Sixteen
  * pinned corpus vectors act as the coarse centroids (a deterministic stand-
  * in for trained k-means centroids; pinning keeps the oracle exact): every
  * vector is assigned to its highest-cosine centroid (its inverted list),
  * and a query probes its `nprobe` nearest lists, scoring only their
  * members exactly. The TRAINED path exists too: AnnRecallSpec runs 3 Lloyd
  * rounds of the C3 kernel k-means over the same seeds and shows recall
  * improving 0.60 → 0.70 — training the quantizer is a strict upgrade the
  * oracle just can't follow (64-dim unrolled-CTE training SQL).
  *
  * Scale shape: the centroid set is a broadcast-joined 16-row dimension;
  * assignment is one map-side-combined aggregate per vector (max-struct
  * argmax — no window over the data); the candidate join shuffles on
  * list_id, and per-list fan-in is the list size (≈ n/nlist), never n².
  * nlist grows with the corpus (and lists can be range-bucketed on disk) —
  * exactly the IVF index layout vector stores use.
  *
  * Assignment ties (equal cosine) break toward the smallest centroid id on
  * both engines: Spark's max(struct(cos, -cent_id)) ≙ the oracle's
  * row_number ORDER BY cos DESC, cent_id ASC.
  */
object S4AnnIvf extends GraftQuery {
  val name = "s4_ann_ivf"
  val describe = "IVF ANN: 16 pinned coarse centroids, nprobe=6, exact re-rank, top-10"

  private val k = 10
  private val nQueries = 5
  private val d = Embeddings.dims
  private[queries] val centLo = 100L
  private[queries] val nList = 16
  private val nProbe = 6

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val cents = e.filter(col("vec_id") >= centLo && col("vec_id") < centLo + nList)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val centCos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("embedding"), col("cemb"))
    val scored = e.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cent_id"), centCos.as("cos"))
    // argmax per vector without a window: lexicographic max over
    // (cos, -cent_id); `first(embedding)` is deterministic (identical in
    // every row of the group).
    val assigned = scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cent_id")).as("nid"))).as("m"),
        first(col("embedding")).as("embedding"))
      .select(col("vec_id"), col("embedding"), (-col("m.nid")).as("list_id"))
    // Query side: tiny (nQueries × nList rows) — rank probes per query.
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cent_id").asc)
    val probes = scored.filter(col("vec_id") < nQueries)
      .withColumn("pk", row_number().over(wProbe))
      .filter(col("pk") <= nProbe)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("cent_id").as("probe_list"))
    val pairCos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("qemb"), col("embedding"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probes
      .join(assigned, col("probe_list") === col("list_id") && col("qid") =!= col("vec_id"))
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val centCos = s"(${VectorOps.dotSql("v.embedding", "c.embedding", d)}) / (v.nrm * c.nrm)"
    val pairCos = s"(${VectorOps.dotSql("q.qemb", "n.embedding", d)}) / (q.qnrm * n.nrm)"
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${VectorOps.normSql("embedding", d)} AS nrm
         |  FROM embeddings),
         |cents AS (SELECT * FROM e WHERE vec_id >= $centLo AND vec_id < ${centLo + nList}),
         |scored AS (
         |  SELECT v.vec_id, v.embedding, v.nrm, c.vec_id AS cent_id, $centCos AS cos
         |  FROM e v CROSS JOIN cents c),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rk
         |  FROM scored),
         |assigned AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS list_id FROM ranked WHERE rk = 1),
         |probes AS (
         |  SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, cent_id AS probe_list
         |  FROM ranked WHERE vec_id < $nQueries AND rk <= $nProbe),
         |cand AS (
         |  SELECT q.qid AS query_id, n.vec_id AS neighbor_id, $pairCos AS cos
         |  FROM probes q JOIN assigned n
         |    ON q.probe_list = n.list_id AND q.qid <> n.vec_id),
         |rr AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
         |FROM rr WHERE rank <= $k""".stripMargin)
  }
}

/** s5: int8-QUANTIZED similarity search — the memory-side scale lever the
  * LSH/IVF paths (s2/s4) don't touch: a 64-dim float32 embedding is 256
  * bytes, its int8 quantization 64 bytes + one float scale, so a 100 TB
  * vector corpus scans (and caches) at a quarter the bytes, with scoring in
  * cheap integer arithmetic. This is scalar quantization as vector stores
  * ship it (per-vector symmetric max-abs scaling); the score is the
  * dequantized dot product q_a·q_b·s_a·s_b.
  *
  * Determinism/parity: the quantized codes are exact integers on both
  * engines — s = max|x|/127 and x/s are correctly-rounded double ops,
  * floor(x/s + 0.5) is exact, so codes match bit-for-bit; the integer dot
  * product is exact; the final two multiplies are correctly-rounded doubles
  * evaluated left-to-right on both sides. Ranking ties break on neighbor id.
  *
  * HOF note: the per-row scale `s` is referenced inside the quantize lambda;
  * it is bound through a single-element struct array (the TextOps
  * shingleHashes trick) so CollapseProject cannot inline the 64-term
  * max-abs reduction into every one of the 64 lambda evaluations.
  */
object S5AnnQuantized extends GraftQuery {
  val name = "s5_ann_quant"
  val describe = "int8 scalar-quantized ANN: max-abs per-vector scale, integer dot, top-10"

  private val k = 10
  private val nQueries = 5
  private val d = Embeddings.dims

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val scale = array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0
    val e0 = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), scale.as("s"))
    // Quantize with `s` bound once per row (see scaladoc); a zero vector
    // (s = 0) quantizes to zeros instead of NaN codes.
    val quantized = flatten(transform(
      array(struct(col("embedding").as("e"), col("s").as("sc"))),
      p => transform(p.getField("e"),
        x => when(p.getField("sc") === 0.0, lit(0L))
          .otherwise(floor(x.cast("double") / p.getField("sc") + 0.5).cast("long")))))
    val e = e0.select(col("vec_id"), col("s"), quantized.as("qv"))
    val qdot = aggregate(
      zip_with(col("q.qv"), col("n.qv"), (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    e.alias("q").filter(col("vec_id") < nQueries)
      .join(e.alias("n"), col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("n.vec_id").as("neighbor_id"),
        (qdot * col("q.s") * col("n.s")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 6).as("qscore"))
  }

  val oracle = {
    val qdot = (1 to d).map(i => s"q.qv[$i] * n.qv[$i]").mkString(" + ")
    Some(
      s"""WITH e0 AS (
         |  SELECT vec_id, embedding,
         |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
         |  FROM embeddings),
         |e AS (
         |  SELECT vec_id, s,
         |         CASE WHEN s = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
         |              ELSE list_transform(embedding,
         |                     x -> CAST(floor(CAST(x AS DOUBLE) / s + 0.5) AS BIGINT)) END AS qv
         |  FROM e0),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         ($qdot) * q.s * n.s AS score
         |  FROM e q JOIN e n ON q.vec_id < $nQueries AND q.vec_id <> n.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, score,
         |         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, round(score, 6) AS qscore
         |FROM ranked WHERE rank <= $k""".stripMargin)
  }
}
