package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.Tables
import graft.operators.VectorOps

/** s7: product-quantization (PQ) encoding — the codebook compression that
  * backs billion-scale ANN (IVF-PQ): each unit-normalized vector is split
  * into M contiguous subvectors and each subvector replaced by the id of
  * its nearest codeword in that subspace's K-entry codebook, so a 64-dim
  * float vector becomes M small codes (here 16×4 bits — 256 bytes → 8, a
  * 32× scan-size compression).
  * Complements the existing ANN family: s2 hashes (sign-LSH), s4/s6 route
  * (IVF lists), s5 quantizes scalars (int8), s7 quantizes SUBSPACES.
  *
  * Codebooks are seeded from pinned corpus vectors (the s4/s6 convention:
  * deterministic, engine-neutral); training them would be M independent
  * runs of the s6 Lloyd loop, one per subspace, over 8-dim slices — same
  * machinery, deliberately not repeated here.
  *
  * Output surface: per-(subspace, code) cell occupancy and quantization
  * distortion (Σ ‖x_m − c‖², rounded) — 256 rows that are only right if
  * all N·M·K subspace distances agreed across engines; the ADC search
  * path (asymmetric distance: Σ_m ⟨q_m, codeword(code_m)⟩) is exercised
  * by PqRecallSpec against s1's exact ranking.
  *
  * Scale shape: the codebook is an M·K-row broadcast; encoding is one
  * map-side explode(M)×join(K) + a keyed min-struct argmin per
  * (vector, subspace) — shuffle carries one row per vector per subspace
  * (the map-side-combined aggregate), nothing is ever O(N²) and nothing
  * but the O(M·K) codebook visits the driver. This is exactly the PQ
  * encode pass FAISS runs per shard; at 100 TB it parallelizes per
  * partition with zero coordination.
  *
  * Determinism: vectors are normalized once (same x/‖x‖ the oracle
  * computes); each subspace distance is the SAME left-to-right 8-term
  * Σ(x_i−c_i)² both engines evaluate (no |x|²+|c|²−2⟨x,c⟩ algebra, which
  * would reorder the floating arithmetic); ties break toward the smaller
  * code id on both sides; distortion sums are rounded to 6 decimals.
  */
object S7AnnPq extends GraftQuery {
  val name = "s7_ann_pq"
  val describe = "product-quantization encode: 16 subspaces x 16 codes, cell occupancy + distortion"

  private val d = Embeddings.dims
  private[queries] val subspaces = 16
  private[queries] val subDim = d / subspaces
  private[queries] val codes = 16
  private val centLo = 200L

  /** Normalized embeddings (vec_id, en: array<double>). Normalization runs
    * in a typed map so the 64-term norm is computed ONCE per row — dividing
    * inside a Catalyst lambda would re-evaluate the captured norm per
    * element (the HOF-capture trap documented on d5/TextOps.shingles). The
    * per-element x/‖x‖ is the same IEEE division the oracle's
    * list_transform performs.
    */
  private def normalized(spark: SparkSession, sfDir: String): DataFrame =
    // Round 15: pure projection instead of the typed .map closure — the
    // closure ran outside whole-stage codegen (deserialize → Scala lambda →
    // reserialize per row) AND blocked predicate pushdown through
    // MapElements, so codebook()'s vec_id filter deserialized the whole
    // corpus to collect K rows. Same arithmetic, bit-identical doubles
    // (x / n is the identical IEEE divide). The norm is BOUND as a lambda
    // variable through a single-element array (the TextOps binding rule):
    // a plain two-projection form lets CollapseProject inline the 64-term
    // sqrt tree into the divide lambda, re-evaluating it PER ELEMENT —
    // measured s7 1.19 s → 3.01 s before this binding; the transform
    // TARGET (`ed`) is evaluated once per row, so it needs no binding.
    Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("ed"),
      VectorOps.norm(col("embedding"), d).as("nrm"))
      .select(col("vec_id"),
        flatten(transform(array(col("nrm")), n =>
          transform(col("ed"), x => x / n))).as("en"))

  /** The pinned codebook as a broadcastable frame (m, k, cv: array<double>),
    * cv = subspace-m slice of pinned vector centLo+k. Collected once — M·K
    * rows of master state, not a data collect.
    */
  private def codebook(spark: SparkSession, sfDir: String): DataFrame = {
    val pinned = normalized(spark, sfDir)
      .filter(col("vec_id") >= centLo && col("vec_id") < centLo + codes)
      .collect()
      .map(r => ((r.getLong(0) - centLo).toInt, r.getSeq[Double](1)))
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]
    for ((k, v) <- pinned; m <- 0 until subspaces)
      rows.add(Row(m, k, v.slice(m * subDim, (m + 1) * subDim)))
    spark.createDataFrame(rows, StructType(Seq(
      StructField("m", IntegerType, nullable = false),
      StructField("k", IntegerType, nullable = false),
      StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false))))
  }

  /** Left-to-right Σ(a[i]−b[i])² over the subspace width — the exact term
    * order the oracle SQL uses, so the doubles match bit-for-bit.
    */
  private def l2sq(a: Column, b: Column): Column =
    (0 until subDim).map { i =>
      (a.getItem(i) - b.getItem(i)) * (a.getItem(i) - b.getItem(i))
    }.reduce(_ + _)

  /** PQ encode: one row per (vec_id, m) with the argmin code and its
    * squared distance. Shared by the oracle surface and the ADC spec path.
    */
  private[queries] def encode(spark: SparkSession, sfDir: String): DataFrame = {
    val subs = normalized(spark, sfDir)
      .select(col("vec_id"), explode(sequence(lit(0), lit(subspaces - 1))).as("m"), col("en"))
      .select(col("vec_id"), col("m"),
        slice(col("en"), col("m") * subDim + 1, lit(subDim)).as("xm"))
    subs.join(broadcast(codebook(spark, sfDir)), "m")
      .select(col("vec_id"), col("m"), col("k"), l2sq(col("xm"), col("cv")).as("d2"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d2"), col("k"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.k").as("code"), col("best.d2").as("d2"))
  }

  def run(spark: SparkSession, sfDir: String): DataFrame =
    encode(spark, sfDir)
      .groupBy(col("m"), col("code"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("d2")), 6).as("distortion"))

  /** ADC (asymmetric distance) search over the PQ codes: each query builds
    * an M·K lookup table of subspace dot products against the codebook
    * (driver-free: a broadcast join), and a database vector's score is the
    * sum of its M codes' LUT entries — the FAISS search shape, where the
    * scan touches only the 4-bit codes, never the original vectors.
    * Recall vs s1's exact ranking is pinned in PqRecallSpec.
    */
  private[queries] def adcTopK(spark: SparkSession, sfDir: String, nQueries: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qs = normalized(spark, sfDir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        explode(sequence(lit(0), lit(subspaces - 1))).as("m"), col("en"))
      .select(col("query_id"), col("m"),
        slice(col("en"), col("m") * subDim + 1, lit(subDim)).as("qm"))
    val dotQ = (0 until subDim).map(i => col("qm").getItem(i) * col("cv").getItem(i)).reduce(_ + _)
    // LUT: nQueries·M·K rows — broadcast to every encoder partition.
    val lut = qs.join(codebook(spark, sfDir), "m")
      .select(col("query_id"), col("m"), col("k").as("code"), dotQ.as("p"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id").asc)
    encode(spark, sfDir)
      .join(broadcast(lut), Seq("m", "code"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("p")).as("score"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** ADC shortlist → EXACT re-rank (the s5 int8 pattern, and how IVF-PQ
    * deployments actually answer queries): the compressed scan nominates
    * `shortlist` candidates per query, then only those touch the original
    * vectors for an exact cosine top-k. Shortlist size is the
    * recall-vs-bytes-read knob.
    */
  private[queries] def adcRerankTopK(spark: SparkSession, sfDir: String,
      nQueries: Int, k: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val cand = adcTopK(spark, sfDir, nQueries, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val cos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("q.embedding"), col("n.embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .join(e.alias("n"), cand("neighbor_id") === col("n.vec_id"))
      .join(broadcast(e.alias("q").filter(col("q.vec_id") < nQueries)),
        cand("query_id") === col("q.vec_id"))
      .select(col("query_id"), col("neighbor_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The ADC lookup table, QUANTIZED to an integer grid: per (query,
    * subspace, code), `round(⟨q_m, codeword⟩ · scale)` as a long. The
    * integer grid is what makes a COMPOSED consumer (s11) cross-engine
    * deterministic: an ADC score is then a sum of M longs — exact in any
    * order — where a double sum would rank-flip near ties on summation
    * order (the Rounding.exactSum argument, applied to scores instead of
    * aggregates; FAISS's fast-scan path quantizes its LUTs for SIMD the
    * same way). O(nQueries·M·K) rows — broadcast-sized.
    */
  private[queries] def lutQuantized(
      spark: SparkSession, sfDir: String, nQueries: Int, scale: Double): DataFrame = {
    val qs = normalized(spark, sfDir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"),
        explode(sequence(lit(0), lit(subspaces - 1))).as("m"), col("en"))
      .select(col("qid"), col("m"),
        slice(col("en"), col("m") * subDim + 1, lit(subDim)).as("qm"))
    val dotQ = (0 until subDim).map(i => col("qm").getItem(i) * col("cv").getItem(i)).reduce(_ + _)
    qs.join(codebook(spark, sfDir), "m")
      .select(col("qid"), col("m"), col("k").as("code"),
        round(dotQ * lit(scale)).cast("long").as("lq"))
  }

  /** The PQ pipeline as oracle CTEs — normalize, codebook, subspace slices,
    * per-cell distances, argmin encode — with every CTE name prefixed by `p`
    * so a composing query (s11 joins these against s6's trained-IVF CTE
    * chain, which already owns the name `e`) can avoid collisions while
    * [[oracle]] keeps the original unprefixed names (and therefore its
    * byte-identical SQL).
    */
  private[queries] def pqCtesSql(p: String): String = {
    val en = s"list_transform(embedding, x -> CAST(x AS DOUBLE) / ${VectorOps.normSql("embedding", d)})"
    // DuckDB lists are 1-based; subspace slice = en[m*subDim+1 .. (m+1)*subDim],
    // materialized per (vector, subspace) so the distance terms index it 1..subDim.
    val d2 = (1 to subDim).map(i => s"(s.xm[$i] - c.cv[$i]) * (s.xm[$i] - c.cv[$i])")
      .mkString(" + ")
    s"""${p}e AS (SELECT vec_id, $en AS en FROM embeddings),
       |${p}cb AS (
       |  SELECT m.m, CAST(vec_id - $centLo AS INT) AS k,
       |         ${p}e.en[m.m * $subDim + 1 : (m.m + 1) * $subDim] AS cv
       |  FROM ${p}e CROSS JOIN (SELECT unnest(range(0, $subspaces)) AS m) m
       |  WHERE vec_id >= $centLo AND vec_id < ${centLo + codes}),
       |${p}subs AS (
       |  SELECT vec_id, m.m, ${p}e.en[m.m * $subDim + 1 : (m.m + 1) * $subDim] AS xm
       |  FROM ${p}e CROSS JOIN (SELECT unnest(range(0, $subspaces)) AS m) m),
       |${p}scored AS (
       |  SELECT s.vec_id, s.m, c.k, $d2 AS d2
       |  FROM ${p}subs s JOIN ${p}cb c ON s.m = c.m),
       |${p}enc AS (
       |  SELECT vec_id, m, k AS code, d2 FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id, m ORDER BY d2 ASC, k ASC) AS rk
       |    FROM ${p}scored) WHERE rk = 1)""".stripMargin
  }

  val oracle = Some(
    s"""WITH ${pqCtesSql("")}
       |SELECT m, code, count(*) AS cnt, round(sum(d2), 6) AS distortion
       |FROM enc GROUP BY m, code""".stripMargin)
}
