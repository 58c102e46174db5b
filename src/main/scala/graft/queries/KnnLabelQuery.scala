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
  * Scale shape: probe×base scored join is the exact-kNN baseline (s1's
  * plan: per-query ranking windows, never a global sort); at corpus scale
  * the same vote aggregate composes with any candidate generator — s2's
  * LSH buckets or s4/s6's IVF lists — because votes only need the top-k
  * list per probe, not the full scored set. The vote itself is one
  * (query, label) partial+final aggregate followed by a per-query argmax
  * window over ≤|labels| rows.
  */
object V2KnnLabel extends GraftQuery {
  val name = "v2_knn_label"
  val describe = "kNN label transfer: majority vote of 10 nearest labeled neighbours per probe"

  private val k = 10
  private val probeMod = 25
  private val d = Embeddings.dims

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.embeddings(spark, sfDir)
    // Norms are projected BEFORE the join (once per row, not once per pair —
    // the join multiplies every post-join expression by |probes|).
    val probes = e.filter(pmod(col("vec_id"), lit(probeMod)) === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qemb"),
        VectorOps.norm(col("embedding"), d).as("qnrm"))
    val base = e.filter(pmod(col("vec_id"), lit(probeMod)) =!= 0)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("nemb"),
        col("label"), VectorOps.norm(col("embedding"), d).as("nnrm"))

    val cos = VectorOps.dot(col("qemb"), col("nemb"), d) / (col("qnrm") * col("nnrm"))
    val voteW = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("label").asc)

    // Top-k via the typed bounded aggregator, NOT a rank window: the window
    // would shuffle+sort the full probe×base pair stream on query_id; the
    // aggregator's map-side partial combine carries at most k entries per
    // query per partition through the exchange (graft.operators.TopK —
    // identical (cos desc, neighbor_id asc) order, equality pinned by
    // TopKSpec). The vote then runs over ≤ k rows per query.
    import spark.implicits._
    val scored = base.crossJoin(broadcast(probes))
      .select(col("query_id"), cos.as("cos"), col("neighbor_id"), col("label"))
      .as[(Long, Double, Long, Int)]
    scored
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
