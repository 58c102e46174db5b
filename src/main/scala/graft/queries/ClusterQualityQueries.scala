package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** v5: label PURITY of the semantic-dup clusters — "does near-duplicate
  * collapse respect class boundaries?", the check a curation team runs
  * before trusting cluster-level survivor selection (a cluster that mixes
  * labels means the dedup threshold is merging semantically distinct
  * content, and its survivor silently drops a class). One row per d16
  * cluster: member count, majority label (ties → smaller label), and
  * purity = majority mass / cluster size.
  *
  * Composition: clusters are d16's OWN run (the shared
  * `d16_verified_pairs` stage + the same min-label propagation), labels
  * come from one vec_id-keyed equi-join — so a purity regression points at
  * the dedup config, not at a reimplementation of it.
  *
  * Engine-exactness: counts are exact integers; the majority argmax is a
  * total order (count desc, label asc); purity_e6 is one exactly-rounded
  * IEEE division of exact integers, rounded to a LONG.
  *
  * Scale: the label join is vec_id-keyed; the per-cluster aggregate's
  * window partitions hold one row per DISTINCT LABEL in the cluster
  * (≤ |label vocabulary|, not cluster mass — the survivor-collapse
  * bounded-window rule), and everything upstream is d16's audited
  * shape.
  */
object V5ClusterPurity extends GraftQuery {
  val name = "v5_cluster_purity"
  val describe = "label purity per d16 semantic cluster: member count, majority label, purity_e6"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val comp = D16SemanticLshClusters.run(spark, sfDir) // (vec_id, component)
    val lab = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label"))
    val g = comp.join(lab, "vec_id")
      .groupBy(col("component"), col("label"))
      .agg(count(lit(1)).as("c"))
    val byComp = Window.partitionBy(col("component"))
    g.select(col("component"), col("label"), col("c"),
        sum(col("c")).over(byComp).as("n"),
        row_number().over(byComp.orderBy(col("c").desc, col("label").asc)).as("rn"))
      .filter(col("rn") === 1)
      .select(col("component"),
        col("n").as("n_members"),
        col("label").as("majority_label"),
        round(col("c").cast("double") / col("n").cast("double") * 1e6)
          .cast("long").as("purity_e6"))
  }

  val oracle = Some(
    s"""WITH RECURSIVE ${D16SemanticLshClusters.pairsCtesSql},
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM ver
       |  UNION ALL SELECT vec_b, vec_a FROM ver),
       |lab AS (
       |  SELECT DISTINCT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e2.dst, l.label FROM lab l JOIN edges e2 ON l.node = e2.src),
       |cl AS (SELECT node AS vec_id, min(label) AS component FROM lab GROUP BY node),
       |j AS (
       |  SELECT c.component, em.label AS y
       |  FROM cl c JOIN embeddings em ON c.vec_id = em.vec_id),
       |g AS (SELECT component, y, count(*) AS c FROM j GROUP BY 1, 2),
       |r AS (
       |  SELECT component, y, c,
       |         CAST(sum(c) OVER (PARTITION BY component) AS BIGINT) AS n,
       |         row_number() OVER (PARTITION BY component ORDER BY c DESC, y ASC) AS rn
       |  FROM g)
       |SELECT component, n AS n_members, y AS majority_label,
       |       CAST(round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS purity_e6
       |FROM r WHERE rn = 1""".stripMargin)
}

/** g5: DEGREE census of the similarity graph — how many vectors have k
  * verified near-neighbors, the histogram an embedding-dedup team reads to
  * pick collapse policy (a fat tail of high-degree nodes means template
  * families that survivor-per-cluster handles badly; a mass at degree 1
  * means mostly mutual pairs). Completes the g-family's census pair: g4
  * counts triangles (transitivity), g5 counts degrees (mass).
  *
  * Plan: two map-side-combinable aggregates over the shared
  * `d16_verified_pairs` stage output — node degree (keyed on vec id), then
  * the degree histogram (keyed on degree, output bounded by max degree).
  * Nothing corpus-sized beyond the pair list itself.
  */
object G5DegreeCensus extends GraftQuery {
  val name = "g5_degree_census"
  val describe = "similarity-graph degree histogram over d16's verified pairs (collapse-policy census)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = D16SemanticLshClusters.verifiedPairs(spark, sfDir)
      .select(col("vec_a"), col("vec_b"))
    val nodes = pairs.select(col("vec_a").as("node"))
      .unionAll(pairs.select(col("vec_b").as("node")))
    nodes.groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
  }

  val oracle = Some(
    s"""WITH ${D16SemanticLshClusters.pairsCtesSql},
       |nodes AS (
       |  SELECT vec_a AS node FROM ver
       |  UNION ALL SELECT vec_b FROM ver),
       |deg AS (SELECT node, count(*) AS degree FROM nodes GROUP BY node)
       |SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree""".stripMargin)
}
