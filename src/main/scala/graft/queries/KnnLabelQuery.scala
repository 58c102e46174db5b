package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** v2: kNN label transfer — classify each unlabeled probe vector by the
  * majority label of its k nearest labeled neighbours (cosine). The standard
  * weak-supervision step of a training-data pipeline: propagate labels from
  * a small curated set onto the raw corpus (the label-spreading counterpart
  * of v1's per-label centroids).
  *
  * Split is deterministic from the row alone: `vec_id % 25 == 0` rows are
  * the probes (test side), the rest the labeled base — the q10/s3 seeded-
  * hash convention, no RNG. Majority vote over the top-k, ties broken by
  * smaller label; neighbour ranks are bit-identical across engines because
  * the cosine is the unrolled exactly-rounded IEEE expression (s1's
  * argument) with (cos desc, vec_id asc) ordering.
  *
  * Scale shape: this is the EXACT baseline — every probe scores every base
  * vector, with the probe set broadcast — which is the right recall oracle
  * and the wrong 100-TB plan (the broadcast is 4% of the corpus). The vote
  * stage ([[voteTopK]]) is candidate-source-agnostic, and V2cKnnLabelIvf is
  * the composed production path: per-probe candidates from s4's IVF lists
  * through a list_id KEY join (probes never broadcast wholesale), identical
  * vote — recall-pinned against this baseline in KnnCompositionSpec.
  */
object V2KnnLabel extends GraftQuery {
  override val oracleOnly = true // scale twin: v2c_knn_label_ivf (trained-IVF list routing)
  val name = "v2_knn_label"
  val describe = "kNN label transfer: majority vote of 10 nearest labeled neighbours per probe"

  private[queries] val k = 10
  private[queries] val probeMod = 25
  private val d = Embeddings.dims

  /** The shared vote stage: scored candidates (query_id, cos, neighbor_id,
    * label) → top-k per query via the bounded TopK aggregator (map-side
    * partial carries ≤ k entries per query through the exchange; identical
    * (cos desc, neighbor_id asc) order to a rank window) → (query, label)
    * partial+final vote counts → per-query argmax window over ≤ |labels|
    * rows, ties to the smaller label. Any candidate generator that can
    * score its candidates composes with this unchanged.
    */
  private[queries] def voteTopK(
      spark: SparkSession,
      scored: DataFrame): DataFrame = {
    import spark.implicits._
    val voteW = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)
    scored
      .select(col("query_id"), col("cos"), col("neighbor_id"), col("label"))
      .as[(Long, Double, Long, Int)]
      .groupByKey(_._1)
      .mapValues { case (_, c, nid, lab) => (c, nid, lab) }
      .agg(graft.operators.TopK.topK(k).name("top"))
      .flatMap { case (qid, top) => top.map(e => (qid, e._3)) }
      .toDF("query_id", "label")
      .groupBy(col("query_id"), col("label"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(voteW))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val probes = e.filter(pmod(col("vec_id"), lit(probeMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val base = e.filter(pmod(col("vec_id"), lit(probeMod)) =!= 0)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nemb"), col("label"))

    // Fused codegen'd cosine (one tight loop per pair), NOT the unrolled
    // per-dimension tree + precomputed norms: the 64-term unrolled dot was
    // the last per-PAIR unrolled site in the repo and measured ~27 µs/row —
    // the whole gap between v2 (5 s) and s1's identically-shaped scoring
    // (0.4 s). Bit-identical to the oracle's unrolled SQL: the fused loop's
    // 0.0-seeded left-to-right accumulation reproduces the same IEEE chain,
    // and dot/(sqrt(nx)·sqrt(ny)) is the oracle's dot/(qnrm·nnrm) computed
    // from the same doubles (s1 pins this contract hash-exact; recomputing
    // the norms per pair inside the fused loop is cheaper than evaluating
    // one unrolled tree, so the d822a20 norm-prepass is obsolete).
    val cos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("qemb"), col("nemb"))
    // Top-k via the typed bounded aggregator, NOT a rank window: the window
    // would shuffle+sort the full probe×base pair stream on query_id; the
    // aggregator's map-side partial combine carries at most k entries per
    // query per partition through the exchange (graft.operators.TopK —
    // identical (cos desc, neighbor_id asc) order, equality pinned by
    // TopKSpec). The vote then runs over ≤ k rows per query.
    voteTopK(spark, base.crossJoin(broadcast(probes))
      .select(col("query_id"), cos.as("cos"), col("neighbor_id"), col("label")))
  }

  val oracle = {
    val cos = s"(${VectorOps.dotSql("q.qemb", "n.nemb", d)}) / (q.qnrm * n.nnrm)"
    Some(
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qemb, ${VectorOps.normSql("embedding", d)} AS qnrm
         |           FROM embeddings WHERE vec_id % $probeMod = 0),
         |b AS (SELECT vec_id AS neighbor_id, embedding AS nemb, label, ${VectorOps.normSql("embedding", d)} AS nnrm
         |      FROM embeddings WHERE vec_id % $probeMod <> 0),
         |ranked AS (
         |  SELECT q.query_id, n.label,
         |         row_number() OVER (PARTITION BY q.query_id ORDER BY $cos DESC, n.neighbor_id ASC) AS rank
         |  FROM q CROSS JOIN b n),
         |votes AS (
         |  SELECT query_id, label, count(*) AS votes
         |  FROM ranked WHERE rank <= $k GROUP BY query_id, label)
         |SELECT query_id, label AS pred_label, votes
         |FROM (SELECT query_id, label, votes,
         |             row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS vr
         |      FROM votes)
         |WHERE vr = 1""".stripMargin)
  }
}

/** v2c: the COMPOSED kNN label transfer — v2's vote over candidates from
  * s6's TRAINED IVF lists instead of the full base. This is the code path
  * v2's scaladoc promised ("the vote composes with any candidate
  * generator") and the 100-TB replacement for v2's probe-side broadcast:
  *
  *   - the coarse quantizer is s6's (2 cosine Lloyd rounds over the corpus,
  *     seeded from the pinned vectors — trained beats pinned: s4's pinned
  *     quantizer measured 0.45 label agreement at nprobe 8 vs the trained
  *     one's 0.75 (0.85 at the default nprobe 10), because arbitrary corpus
  *     vectors make poor list centers in this near-uniform embedding space,
  *     whose max off-diagonal cosine is 0.51 — a genuinely hard ANN regime
  *     where wider probing is the honest price of recall);
  *   - base vectors are assigned to their argmax-cosine trained list (s6's
  *     broadcast-16-row-dimension + struct-max argmax, no window over data);
  *   - each probe ranks the 16 trained centroids and takes its `nProbe`
  *     nearest lists (a per-probe window over 16 rows);
  *   - candidates come from probes ⋈ lists on list_id — a KEY equi-join
  *     whose shuffle is keyed on list_id, so neither side is ever broadcast
  *     wholesale and per-list fan-in is the list population (n/nlist), not
  *     n·|probes|;
  *   - scoring + top-10 + majority vote are EXACTLY v2's shared voteTopK
  *     (bounded TopK aggregator through the exchange, vote argmax).
  *
  * Approximation is confined to candidate selection: a true neighbour in an
  * unprobed list is missed, exactly s4/s8's recall story. Label agreement
  * with exact v2 is pinned in KnnCompositionSpec (floor 0.75, the
  * AnnRecallSpec discipline; the spec also prints the full nprobe curve);
  * majority voting absorbs most neighbour misses.
  *
  * Scale knobs are s6/s8's: nlist grows with the corpus (lists stay
  * executor-sized), nProbe sets the recall/cost point; k and the vote are
  * scale-free. The oracle replays training, assignment, probing, candidate
  * top-k and vote in SQL (s6's unrolled-trajectory CTE chain).
  */
object V2cKnnLabelIvf extends GraftQuery {
  val name = "v2c_knn_label_ivf"
  val describe = "kNN label transfer via trained-IVF candidates: nprobe lists per probe, shared top-k vote"

  private val d = Embeddings.dims
  private[queries] val defaultNProbe = 10
  private val k = V2KnnLabel.k
  private val probeMod = V2KnnLabel.probeMod

  def run(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, defaultNProbe)

  def run(spark: SparkSession, sfDir: String, nProbe: Int): DataFrame = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val eL = Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("emb"),
      col("label"))
    val cents = S6AnnIvfTrained.trainedCentroidsFor(spark, sfDir)
    val centCos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("emb"), col("cemb"))
    // s6's scoring shape with the label carried through (scoredAgainst drops
    // it, and re-joining labels later would cost a corpus-keyed join).
    val scored = eL.join(broadcast(S6AnnIvfTrained.centsDf(spark, cents)))
      .select(col("vec_id"), col("emb"), col("label"), col("list_id"), centCos.as("cos"))
    // Base-side list assignment: argmax without a window (s6's shape).
    val assigned = scored.filter(pmod(col("vec_id"), lit(probeMod)) =!= 0)
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("list_id")).as("nid"))).as("m"),
        first(col("emb")).as("nemb"), first(col("label")).as("label"))
      .select(col("vec_id").as("neighbor_id"), col("nemb"), col("label"),
        (-col("m.nid")).cast("int").as("assigned_list"))
    // Probe side: nProbe nearest lists per query (window over 16 rows/query).
    val wProbe = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("list_id").asc)
    val probes = scored.filter(pmod(col("vec_id"), lit(probeMod)) === 0)
      .withColumn("pk", row_number().over(wProbe))
      .filter(col("pk") <= nProbe)
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("list_id").as("probe_list"))
    val pairCos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("qemb"), col("nemb"))
    // assigned_list KEY join — the line that replaces v2's crossJoin(broadcast).
    V2KnnLabel.voteTopK(spark,
      probes.join(assigned, col("probe_list") === col("assigned_list"))
        .select(col("query_id"), pairCos.as("cos"), col("neighbor_id"), col("label")))
  }

  val oracle = {
    val iters = S6AnnIvfTrained.iterations
    val pairCos = s"(${VectorOps.dotSql("q.qemb", "n.emb", d)}) / " +
      s"((${VectorOps.normSql("q.qemb", d)}) * (${VectorOps.normSql("n.emb", d)}))"
    Some(
      s"""WITH ${S6AnnIvfTrained.trainedCtesSql}${S6AnnIvfTrained.scoreBlockSql("F", s"c$iters")},
         |lab AS (SELECT vec_id, label FROM embeddings),
         |base AS (
         |  SELECT a.vec_id AS neighbor_id, a.emb, l.label, a.list_id
         |  FROM aF a JOIN lab l ON a.vec_id = l.vec_id
         |  WHERE a.vec_id % $probeMod <> 0),
         |qp AS (
         |  SELECT vec_id AS query_id, emb AS qemb, list_id AS probe_list FROM (
         |    SELECT s.*, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, list_id ASC) AS pk
         |    FROM sF s WHERE vec_id % $probeMod = 0)
         |  WHERE pk <= $defaultNProbe),
         |cand AS (
         |  SELECT q.query_id, n.neighbor_id, n.label, $pairCos AS cos
         |  FROM qp q JOIN base n ON q.probe_list = n.list_id),
         |topk AS (
         |  SELECT query_id, label FROM (
         |    SELECT query_id, label,
         |           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |    FROM cand)
         |  WHERE rank <= $k),
         |votes AS (SELECT query_id, label, count(*) AS votes FROM topk GROUP BY 1, 2)
         |SELECT query_id, label AS pred_label, votes
         |FROM (SELECT query_id, label, votes,
         |             row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label ASC) AS vr
         |      FROM votes)
         |WHERE vr = 1""".stripMargin)
  }
}
