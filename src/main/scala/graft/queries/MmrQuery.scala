package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** s10: MMR diversity selection — maximal-marginal-relevance re-ranking
  * (Carbonell & Goldstein 1998) of an ANN shortlist: greedily pick k items
  * maximizing λ·rel(x) − (1−λ)·max_{s∈selected} sim(x, s). The data-
  * selection operator of the similarity family: s1/s2/s4-s9 answer "what is
  * NEAREST?", this answers "what near set is also DIVERSE?" — the shape
  * used for exemplar selection, dedup-aware few-shot pools, and
  * evaluation-set subsampling, where plain top-k returns k copies of the
  * same neighborhood.
  *
  * Shape at scale — the standard two-phase re-rank:
  *   1. SHORTLIST (cluster): relevance of every vector to the query is a
  *      scan-bound broadcast-1-row pass (in production, any s-series
  *      candidate generator slots in — the v2c composition precedent);
  *      TakeOrdered keeps `shortlist` rows, never a global sort.
  *   2. PAIR MATRIX (cluster): pairwise cosines among the shortlist — a
  *      broadcast self-join over `shortlist²` rows (50² here; the knob is a
  *      constant, independent of corpus size).
  *   3. GREEDY (driver): the k-step argmax fold over the shortlist×shortlist
  *      matrix — O(k·shortlist²) driver work on a BOUNDED collect (the A4
  *      master-fold budget, like every iterate loop's 1-row folds; the
  *      greedy recurrence is inherently sequential, so the driver is the
  *      honest place for it).
  *
  * Determinism — the greedy fold runs in EXACT INTEGER space: rel and sim
  * are rounded to the 1e-6 grid (bit-identical across engines — the s1
  * unrolled-IEEE argument) and scaled to micro-units R, M; with λ = 0.7
  * every MMR score is the INTEGER 7·R − 3·M in 1e-7 units, so each step's
  * argmax compares integers (ties to the lower vec_id) and no float
  * rounding exists anywhere past the grid. This matters precisely here:
  * 0.7·(1e-6-grid value) lands EXACTLY on a 1e-6 midpoint whenever 7·r ≡ 5
  * (mod 10) — ~10% of shortlist items — and Spark (exact BigDecimal
  * HALF_UP) and DuckDB (scaled double nearest) disagree on such midpoints;
  * a `round(score, 6)` surface would be t17's hash failure by construction.
  * The reported score is score/10⁷ — an exact integer-to-double conversion
  * and one correctly-rounded division, identical in both engines. The
  * oracle unrolls the k greedy steps as chained 1-row CTEs (the k1/q9
  * unrolled-loop discipline) over the same shortlist and pair matrix.
  */
object S10MmrSelect extends GraftQuery {
  val name = "s10_mmr_select"
  val describe = "MMR diversity top-k: greedy λ·rel − (1−λ)·max-sim re-rank of the ANN shortlist, exact-integer scores"

  private val d = Embeddings.dims
  private val queryId = 0
  private val k = 10
  private val shortlist = 50
  // λ = 0.7 ⇒ integer scores 7·R − 3·M in 1e-7 units (see scaladoc).
  private val lambdaNum = 7L
  private val coLambdaNum = 3L

  /** Phase-1 shortlist as a plan (pre-persist), exposed so the plan spec
    * can pin its TakeOrdered shape — `run` caches it for the two phase-2/3
    * consumers.
    */
  private[queries] def shortlistFrame(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === queryId)
    val qcos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("n.embedding"), col("q.embedding"))
    e.alias("n").filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q.alias("q")))
      .select(col("n.vec_id").as("vec_id"), col("n.embedding").as("embedding"),
        round(qcos, 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(shortlist)
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val sl = graft.CacheScope.persisted(shortlistFrame(spark, sfDir))
    val pcos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("a.embedding"), col("b.embedding"))
    // Pairwise matrix among shortlist rows (both directions; shortlist² is a
    // config constant, so the broadcast join is bounded regardless of sf).
    val pairs = sl.alias("a")
      .join(broadcast(sl.alias("b")), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), round(pcos, 6).as("sim"))
    // Bounded collects: `shortlist` rows + `shortlist²` rows (the A4 fold
    // budget). rel/sim are grid-6 doubles, so ·1e6 sits within an ulp of an
    // integer and any nearest-integer rounding is exact on both engines.
    val rel = sl.select(col("vec_id"), col("rel")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val relScaled = rel.map { case (v, x) => v -> math.round(x * 1e6) }
    val simScaled = pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> math.round(r.getDouble(2) * 1e6)).toMap
    val selected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val scores = scala.collection.mutable.ArrayBuffer.empty[Long]
    val remaining = scala.collection.mutable.SortedSet.empty[Long] ++ relScaled.keys
    for (_ <- 1 to math.min(k, relScaled.size)) {
      val best = remaining.map { v =>
        val penalty =
          if (selected.isEmpty) 0L
          else coLambdaNum * selected.map(s => simScaled(v -> s)).max
        (v, lambdaNum * relScaled(v) - penalty)
      }.minBy { case (v, s) => (-s, v) } // max integer score, ties to the lower id
      selected += best._1
      scores += best._2
      remaining -= best._1
    }
    val rows = selected.toSeq.zip(scores).zipWithIndex.map { case ((v, s), i) =>
      (i + 1, v, rel(v), s.toDouble / 1e7)
    }
    spark.createDataFrame(rows)
      .toDF("rank", "vec_id", "rel", "mmr_score")
  }

  val oracle = {
    val qcos = s"(${VectorOps.dotSql("n.embedding", "q.embedding", d)}) / (n.nrm * q.nrm)"
    val pcos = s"(${VectorOps.dotSql("a.embedding", "b.embedding", d)}) / (a.nrm * b.nrm)"
    // Unrolled greedy steps: p_i = picks so far; s_i = the argmax among the
    // rest, scored 7·R − 3·max(M) in exact 1e-7-unit integers. Every CTE is
    // MATERIALIZED (the BpeQuery.scala:150 discipline): p_i unions all
    // previous s_j, so DuckDB's default inlining would re-evaluate the whole
    // prefix at every step — 2^k expansion of the 128-term dot-product scan.
    val steps = (2 to k).map { i =>
      val prev = (1 until i).map(j => s"SELECT vec_id, rank, rel, score FROM s$j")
        .mkString(" UNION ALL ")
      s"""p$i AS MATERIALIZED ($prev),
         |s$i AS MATERIALIZED (
         |  SELECT c.vec_id, $i AS rank, c.rel,
         |         $lambdaNum * c.rels - $coLambdaNum * (
         |           SELECT max(m.sims) FROM mat m
         |           WHERE m.va = c.vec_id AND m.vb IN (SELECT vec_id FROM p$i)) AS score
         |  FROM sl c
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM p$i)
         |  ORDER BY score DESC, c.vec_id ASC LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val all = (1 to k).map(j => s"SELECT * FROM s$j").mkString(" UNION ALL ")
    Some(
      s"""WITH e AS (SELECT vec_id, embedding, ${VectorOps.normSql("embedding", d)} AS nrm FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id = $queryId),
         |sl AS MATERIALIZED (
         |  SELECT n.vec_id, n.embedding, n.nrm, round($qcos, 6) AS rel,
         |         CAST(round(round($qcos, 6) * 1000000) AS BIGINT) AS rels
         |  FROM e n CROSS JOIN q
         |  WHERE n.vec_id <> $queryId
         |  ORDER BY rel DESC, n.vec_id ASC LIMIT $shortlist),
         |mat AS MATERIALIZED (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |         CAST(round(round($pcos, 6) * 1000000) AS BIGINT) AS sims
         |  FROM sl a JOIN sl b ON a.vec_id <> b.vec_id),
         |s1 AS MATERIALIZED (
         |  SELECT vec_id, 1 AS rank, rel, $lambdaNum * rels AS score
         |  FROM sl ORDER BY score DESC, vec_id ASC LIMIT 1),
         |$steps
         |SELECT rank, vec_id, rel, CAST(score AS DOUBLE) / 10000000.0 AS mmr_score
         |FROM ($all)""".stripMargin)
  }
}
