package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** d10: SEMANTIC duplicate clusters — connected components over d5's exact
  * embedding-cosine similar pairs, labeling every involved vector with its
  * cluster's minimum vec_id (the canonical keep). This is the SemDeDup-style
  * semantic step of a training-data pipeline: d7 clusters LEXICAL near-dups
  * (shingle Jaccard), this clusters MEANING-level ones (two documents can
  * share no 3-gram yet embed within ε) so a curation job can keep one
  * exemplar per semantic group.
  *
  * Composition: D5's tiled block-pair mining feeds the shared min-label
  * propagation engine (operators.ConnectedComponents — the same loop d7
  * uses, bound to a different pair source). Everything about the scale
  * story is inherited: pair generation is tiled (never all-pairs in one
  * task), the propagation working set is the pair list, per-round lineage
  * truncation, edge-count-driven partitioning.
  *
  * Oracle: the same recursive-CTE closure as d7's, over d5's pair CTE —
  * a different algorithm (breadth-first label closure) reaching the same
  * fixpoint, so agreement is evidence, not construction.
  */
object D10SemanticClusters extends GraftQuery {
  override val oracleOnly = true // scale twin: d16_semantic_lsh (bucketed clusters)
  val name = "d10_semantic_clusters"
  val describe = "semantic dup clusters: connected components over d5 cosine pairs (min vec_id survivor)"

  private val maxRounds = 50

  def run(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir, edgePartitions = D7DupClusters.defaultEdgePartitions)

  def run(spark: SparkSession, sfDir: String, edgePartitions: Int): DataFrame =
    runOverPairs(spark,
      D5EmbedDedup.run(spark, sfDir).select(col("vec_a"), col("vec_b")),
      edgePartitions, name)

  /** The PAIR SOURCE is a parameter (the d2→d4 plug point applied to the
    * semantic family): the default run clusters d5's EXACT pairs — the
    * correctness baseline, O(n²) dot products by construction — while d16
    * feeds the same propagation engine from sign-LSH candidate buckets
    * (candidates verified exactly, never all-pairs), which is the form that
    * survives a 100× corpus. g1/g2 take the same parameter, so swapping the
    * semantic family onto the bucketed source is one argument at every
    * entry point.
    */
  def runOverPairs(
      spark: SparkSession,
      pairs: DataFrame,
      edgePartitions: Int = D7DupClusters.defaultEdgePartitions,
      tag: String = name): DataFrame =
    ConnectedComponents.minLabel(spark, pairs, edgePartitions, maxRounds, tag)
      .select(col("node").as("vec_id"), col("label").as("component"))

  val oracle = Some(
    s"""WITH RECURSIVE ${D5EmbedDedup.pairsCtesSql},
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM d5
       |  UNION ALL SELECT vec_b, vec_a FROM d5),
       |lab AS (
       |  SELECT DISTINCT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e2.dst, l.label FROM lab l JOIN edges e2 ON l.node = e2.src)
       |SELECT node AS vec_id, min(label) AS component
       |FROM lab GROUP BY node""".stripMargin)
}
