package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** s11: the COMPOSED IVF-PQ search — the production billion-scale ANN query
  * shape (coarse quantizer routes, compressed codes score, originals
  * re-rank), assembled entirely from pieces that already carry their own
  * oracles: s6's TRAINED coarse quantizer supplies the candidate lists,
  * s7's PQ codes supply the compressed scan, and the exact cosine re-rank
  * is s8's. This is what FAISS calls IVFPQ + refine; the reference has no
  * ANN at all, so the composition (like the rest of the s-family) extends
  * the engine's surface to what a training-data pipeline needs (SURVEY
  * §2.F) rather than re-expressing a reference operator.
  *
  * Query path, stage by stage:
  *   1. ROUTE — each query probes its `nProbe` highest-cosine s6-trained
  *      lists (s8's probe ranking: a k-row window per query, never over
  *      data). Candidates = members of probed lists via a `list_id`
  *      EQUI-join against the assignment — the v2c discipline: probes are
  *      never broadcast against the corpus.
  *   2. COMPRESSED SCAN — candidates are scored WITHOUT touching their
  *      vectors: each candidate's M=16 PQ codes look up the query's
  *      quantized ADC table (s7's LUT on a 1e-6 integer grid, broadcast —
  *      nQueries·M·K rows) and the ADC score is the SUM OF M LONGS. The
  *      integer grid is the determinism keystone: a double ADC sum would
  *      rank-flip across engines on summation order at the shortlist
  *      boundary; long addition commutes exactly (the s10 MMR
  *      exact-integer-score-space argument). At 100 TB this stage reads
  *      8 bytes/candidate (codes) instead of 256 (vectors) — the 32×
  *      scan-size reduction IS the point of PQ.
  *   3. REFINE — the top-`shortlist` ADC candidates per query (window over
  *      ≤ |probed lists| rows) fetch their ORIGINAL vectors through a keyed
  *      join and an exact fused-cosine top-k decides the answer (s8's
  *      expression, bit-identical to the oracle's unrolled SQL).
  *
  * Recall ladder (pinned in IvfPqRecallSpec): s11 ⊆ s8's candidates by
  * construction (same probed lists), so its recall is bounded by s8's IVF
  * recall; the ADC shortlist then loses only what 64-bit codes misrank past
  * position `shortlist`. Floor pinned vs exact s1 AND agreement vs s8 (the
  * uncompressed twin), so a codebook/quantizer change that degrades either
  * stage fails its own assertion.
  *
  * Everything driver-side is O(k·d) master state (s6's trained centroids);
  * every data-side stage is a keyed join or bounded window — no cartesian
  * anywhere except the 16-row broadcast centroid dimension.
  */
object S11AnnIvfPq extends GraftQuery {
  val name = "s11_ann_ivf_pq"
  val describe = "IVF-PQ composed search: trained-list routing, integer-ADC code scan, exact re-rank top-10"

  private val k = 10
  private val nProbe = 6
  private val nQueries = 5
  private[queries] val shortlist = 50
  private[queries] val lutScale = 1e6
  private val d = Embeddings.dims

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val e = S6AnnIvfTrained.embDoubles(spark, sfDir)
    val cents = S6AnnIvfTrained.trainedCentroidsFor(spark, sfDir)
    val scored = S6AnnIvfTrained.scoredAgainst(spark, e, cents)
    val assigned = S6AnnIvfTrained.assign(spark, e, cents)
      .select(col("vec_id"), col("list_id"))
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("list_id").asc)
    val probes = scored.filter(col("vec_id") < nQueries)
      .withColumn("pk", row_number().over(wProbe))
      .filter(col("pk") <= nProbe)
      .select(col("vec_id").as("qid"), col("list_id").as("probe_list"))

    val cand = probes
      .join(assigned, col("probe_list") === col("list_id") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"))

    val adc = cand
      .join(S7AnnPq.encode(spark, sfDir).select(col("vec_id"), col("m"), col("code")), "vec_id")
      .join(broadcast(S7AnnPq.lutQuantized(spark, sfDir, nQueries, lutScale)),
        Seq("qid", "m", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("lq")).as("score"))
    val wShort = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val short = adc.withColumn("sk", row_number().over(wShort))
      .filter(col("sk") <= shortlist)
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"))

    val pairCos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("qemb"), col("nemb"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    short
      .join(e.select(col("vec_id"), col("emb").as("nemb")),
        short("neighbor_id") === col("vec_id"))
      .join(broadcast(e.filter(col("vec_id") < nQueries)
          .select(col("vec_id").as("qv"), col("emb").as("qemb"))),
        col("query_id") === col("qv"))
      .select(col("query_id"), col("neighbor_id"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val dotq = (1 to S7AnnPq.subDim)
      .map(i => s"s.xm[$i] * c.cv[$i]").mkString(" + ")
    val cos = s"(${VectorOps.dotSql("q.emb", "n.emb", d)}) / " +
      s"((${VectorOps.normSql("q.emb", d)}) * (${VectorOps.normSql("n.emb", d)}))"
    Some(
      s"""WITH ${S6AnnIvfTrained.trainedCtesSql}${
        S6AnnIvfTrained.scoreBlockSql("F", s"c${S6AnnIvfTrained.iterations}")},
         |${S7AnnPq.pqCtesSql("p")},
         |lut AS (
         |  SELECT s.vec_id AS qid, c.m, c.k AS code,
         |         CAST(round(($dotq) * $lutScale) AS BIGINT) AS lq
         |  FROM psubs s JOIN pcb c ON s.m = c.m
         |  WHERE s.vec_id < $nQueries),
         |qp AS (
         |  SELECT vec_id AS qid, list_id AS probe_list FROM (
         |    SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS pk
         |    FROM sF s WHERE vec_id < $nQueries)
         |  WHERE pk <= $nProbe),
         |cand AS (
         |  SELECT q.qid, n.vec_id
         |  FROM qp q JOIN aF n ON q.probe_list = n.list_id AND q.qid <> n.vec_id),
         |adc AS (
         |  SELECT c.qid, c.vec_id, sum(l.lq) AS score
         |  FROM cand c
         |  JOIN penc x ON x.vec_id = c.vec_id
         |  JOIN lut l ON l.qid = c.qid AND l.m = x.m AND l.code = x.code
         |  GROUP BY c.qid, c.vec_id),
         |short AS (
         |  SELECT qid AS query_id, vec_id AS neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id ASC) AS sk
         |    FROM adc)
         |  WHERE sk <= $shortlist),
         |rr AS (
         |  SELECT s.query_id, s.neighbor_id, $cos AS cos
         |  FROM short s
         |  JOIN e q ON q.vec_id = s.query_id
         |  JOIN e n ON n.vec_id = s.neighbor_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM rr)
         |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
         |FROM ranked WHERE rank <= $k""".stripMargin)
  }
}
