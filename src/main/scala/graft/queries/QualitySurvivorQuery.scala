package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** d15: quality-aware survivor selection — inside every d7 duplicate
  * cluster, keep the member with the HIGHEST t2 quality score instead of
  * d7's min-doc_id convention. This is the curation step real dedup
  * deployments run after clustering: the canonical copy should be the best
  * copy (cleanest extraction, least boilerplate), not the one that happened
  * to crawl first; g1 does the same for semantic clusters via centrality,
  * this does it for near-dup clusters via the pipeline's own quality
  * signal (one formula, three consumers now: t2, p1's gate, this).
  *
  * Output: one row per clustered document — (doc_id, component, quality,
  * survivor) with survivor = the component's argmax-quality member
  * (round-6 score; doc_id ascending breaks exact ties deterministically).
  *
  * Scale shape: d7's component labels join the per-doc quality projection
  * on doc_id (hash join, corpus-partitioned), then the per-component argmax
  * is one grouped struct-max — no window over the corpus — and the winners
  * (one row per cluster, a tiny frame) broadcast back onto the members.
  * Quality is computed only for clustered docs; the scan projects two
  * columns.
  *
  * Determinism: the argmax compares the ROUNDED score (t2's hash match
  * proves round-6 cross-engine agreement); comparing raw doubles would let
  * a ulp of exp/ln divergence flip a survivor (p1's threshold discipline).
  */
object D15QualitySurvivor extends GraftQuery {
  val name = "d15_quality_survivor"
  val describe = "per-cluster best-quality survivor: d7 components re-canonicalized by t2 score"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val comp = D7DupClusters.run(spark, sfDir)
    val q = Tables.documents(spark, sfDir)
      .select(col("doc_id"), round(T2Quality.score(col("text")), 6).as("quality"))
    val m = comp.join(q, Seq("doc_id"))
    // Windowless argmax (s4's pattern): lexicographic struct-max picks the
    // highest quality, then the smallest doc_id.
    val best = m.groupBy(col("component"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("component"), (-col("b.nid")).as("survivor"))
    m.join(broadcast(best), Seq("component"))
      .select(col("doc_id"), col("component"), col("quality"), col("survivor"))
  }

  val oracle = Some(
    s"""WITH RECURSIVE ${D4NgramJaccard.pairsCtesSql},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM d4
       |  UNION ALL SELECT doc_b, doc_a FROM d4),
       |lab AS (
       |  SELECT DISTINCT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e.dst, l.label FROM lab l JOIN edges e ON l.node = e.src),
       |comp AS (SELECT node AS doc_id, min(label) AS component FROM lab GROUP BY node),
       |${T2Quality.scoreSqlCte("documents", "qsc")},
       |m AS (
       |  SELECT c.doc_id, c.component, round(q.quality, 6) AS quality
       |  FROM comp c JOIN qsc q ON c.doc_id = q.doc_id),
       |ranked AS (
       |  SELECT component, doc_id,
       |         row_number() OVER (PARTITION BY component
       |                            ORDER BY quality DESC, doc_id ASC) AS rk
       |  FROM m),
       |best AS (SELECT component, doc_id AS survivor FROM ranked WHERE rk = 1)
       |SELECT m.doc_id, m.component, m.quality, b.survivor
       |FROM m JOIN best b ON m.component = b.component""".stripMargin)
}
