package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** s9: FILTERED vector search — top-k cosine neighbours restricted to a
  * metadata predicate (here `label` in an allowed set), the shape every
  * production vector store exposes ("similar docs from source X only",
  * "same-language neighbours"). Composes s4's IVF index with the filter as
  * a PRE-filter: the predicate lands on the indexed side before the
  * candidate join, so candidate generation scans only qualifying vectors.
  * Pre- vs post-filter is the classic vector-store tradeoff — post-filter
  * (filter after top-k) returns fewer than k under selective predicates;
  * pre-filter keeps k guarantees and, in Spark terms, is just predicate
  * pushdown into the list scan (Catalyst pushes the label filter to the
  * parquet scan — the filter costs nothing extra at 100 TB; an ANN store
  * has to build filter bitmaps to do the same).
  *
  * Index shape is s4's: 16 pinned coarse centroids (vec_id 100..115),
  * every vector assigned to its nearest list, queries probe their best 10
  * lists (vs s4's 6 — the standard selectivity adaptation: a 40%-selective
  * filter thins every list, so filtered search widens nprobe to keep the
  * candidate pool, trading bounded extra scan for recall), exact cosine
  * re-rank inside the probed lists. Both engines
  * compute identical assignments and candidate sets, so the oracle
  * reproduces the result row-for-row (the s4 determinism argument).
  */
object S9AnnFiltered extends GraftQuery {
  val name = "s9_ann_filtered"
  val describe = "filtered ANN: IVF probe restricted to label predicate (pre-filter), cosine top-10"

  private val k = 10
  private val nQueries = 5
  private val d = Embeddings.dims
  private val centLo = 100L
  private val nList = 16
  private val nProbe = 10
  private val allowedLabels = Seq(1, 3, 5, 7)

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val cents = e.filter(col("vec_id") >= centLo && col("vec_id") < centLo + nList)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cemb"))
    val centCos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("embedding"), col("cemb"))
    val scored = e.join(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("label"), col("cent_id"), centCos.as("cos"))
    // Indexed side: nearest-list assignment (s4's windowless argmax),
    // THEN the metadata pre-filter — only qualifying vectors enter the
    // candidate join. (Assignment before filtering keeps list geometry
    // identical to the unfiltered index, as a shared physical index would.)
    val assigned = scored
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cent_id")).as("nid"))).as("m"),
        first(col("embedding")).as("embedding"), first(col("label")).as("label"))
      .select(col("vec_id"), col("embedding"), col("label"), (-col("m.nid")).as("list_id"))
      .filter(col("label").isin(allowedLabels: _*))
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
      .select(col("qid").as("query_id"), col("vec_id").as("neighbor_id"),
        col("label"), pairCos.as("cos"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("label"),
        round(col("cos"), 6).as("cosine"))
  }

  val oracle = {
    val centCos = s"(${VectorOps.dotSql("v.embedding", "c.embedding", d)}) / (v.nrm * c.nrm)"
    val pairCos = s"(${VectorOps.dotSql("q.qemb", "n.embedding", d)}) / (q.qnrm * n.nrm)"
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, embedding, label, ${VectorOps.normSql("embedding", d)} AS nrm
         |  FROM embeddings),
         |cents AS (SELECT * FROM e WHERE vec_id >= $centLo AND vec_id < ${centLo + nList}),
         |scored AS (
         |  SELECT v.vec_id, v.embedding, v.label, v.nrm, c.vec_id AS cent_id, $centCos AS cos
         |  FROM e v CROSS JOIN cents c),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cent_id ASC) AS rk
         |  FROM scored),
         |assigned AS (
         |  SELECT vec_id, embedding, label, nrm, cent_id AS list_id FROM ranked
         |  WHERE rk = 1 AND label IN (${allowedLabels.mkString(", ")})),
         |probes AS (
         |  SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, cent_id AS probe_list
         |  FROM ranked WHERE vec_id < $nQueries AND rk <= $nProbe),
         |cand AS (
         |  SELECT q.qid AS query_id, n.vec_id AS neighbor_id, n.label, $pairCos AS cos
         |  FROM probes q JOIN assigned n
         |    ON q.probe_list = n.list_id AND q.qid <> n.vec_id),
         |rr AS (
         |  SELECT query_id, neighbor_id, label, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM cand)
         |SELECT query_id, rank, neighbor_id, label, round(cos, 6) AS cosine
         |FROM rr WHERE rank <= $k""".stripMargin)
  }
}
