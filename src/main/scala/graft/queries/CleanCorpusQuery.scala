package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.TextOps

/** p1: the end-to-end corpus-cleaning PIPELINE — the composition every
  * LLM-training-data deployment actually runs, here as one declared query so
  * the composed plan (not just each stage alone) sits under the oracle:
  *
  *   1. quality gate  — t2's logistic score; docs below the cut are dropped
  *      ("low_quality");
  *   2. exact dedup   — d1's md5(text) grouping among the quality
  *      survivors; non-canonical copies are dropped ("exact_dup");
  *   3. near dedup    — d2's MinHash-LSH candidates + d4's Jaccard verify,
  *      run ONLY over the docs still alive, then d7's connected components
  *      to collapse clusters; non-survivor members are dropped ("near_dup");
  *   4. everything else ships ("kept").
  *
  * Output: one row per INPUT document — (doc_id, quality, status,
  * survivor) where survivor is the doc that stands in for a dropped
  * duplicate (NULL for low_quality: dropped with no replacement; itself for
  * kept). Auditable dispositions, not just the surviving subset: at corpus
  * scale the provenance table is the deliverable a data org keeps.
  *
  * Scale shape: each stage narrows the next stage's input — shingling and
  * LSH run on the post-filter survivor set only (on web corpora the quality
  * gate alone drops 20-50%). Stage 1 is scan-bound; stage 2 is a map-side-
  * combinable groupBy on the content hash + a hash-keyed rejoin (bounded
  * per-task state under any duplicate-family mass — web corpora have
  * families with millions of copies, and a hash-partitioned window would
  * put each family in one task); stage 3 inherits d2/d4/d7's banded-join +
  * pair-list-propagation shapes. The disposition union is append-only
  * column arithmetic.
  *
  * Threshold discipline: the quality gate compares the ROUNDED score
  * (round 6) on both engines — t2's hash match proves round-6 agreement,
  * while gating on the raw double would let a ulp of exp/ln divergence flip
  * a borderline doc's status.
  *
  * Oracle: deliberately a DIFFERENT construction — it runs the d4 chain on
  * the FULL corpus and filters pairs to alive endpoints afterwards, which is
  * algebraically equivalent (LSH band keys and Jaccard are per-doc/per-pair,
  * so subset-then-pair == pair-then-subset) but shares no stage ordering
  * with the Spark plan; agreement is evidence, not construction (d7's
  * oracle discipline).
  */
object P1CleanCorpus extends GraftQuery {
  val name = "p1_clean_corpus"
  val describe = "pipeline: quality gate -> exact dedup -> LSH near-dup collapse -> per-doc disposition"

  private[queries] val qualityThreshold = 0.6
  /** The pair list is tiny relative to the corpus (see d7's
    * `edgePartitionsFor` for the corpus-scale sizing rule).
    */
  private val edgePartitions = 4
  private val maxRounds = 50

  def run(spark: SparkSession, sfDir: String): DataFrame =
    dispositions(spark, sfDir)

  /** The full-corpus disposition table as a SHARED STAGE OUTPUT: built once
    * per [[graft.Materialize]]-enabled run and read by every downstream
    * consumer (p4/p5/p9/p10/p12 all start from these dispositions); the
    * plain inline chain when sharing is off.
    */
  private[queries] def dispositions(spark: SparkSession, sfDir: String): DataFrame =
    graft.Materialize.table(spark, "p1_dispositions", sfDir)(
      runOn(spark, Tables.documents(spark, sfDir)))

  /** The pipeline over an arbitrary (doc_id, text, ...) frame — the seam
    * PipelineSpec uses to drive synthetic fixtures through every status
    * branch (the driver corpus has no exact duplicates, so that branch is
    * vacuous on test data and must be pinned synthetically).
    */
  private[queries] def runOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    // Stage 1: quality gate on the rounded score (see threshold note above).
    val scored = graft.CacheScope.persisted(
      docs.select(col("doc_id"), col("text"),
        round(T2Quality.score(col("text")), 6).as("quality")))
    val lowq = scored.filter(col("quality") < qualityThreshold)
      .select(col("doc_id"), col("quality"),
        lit("low_quality").as("status"), lit(null).cast("long").as("survivor"))
    // Stage 2: exact dedup among quality survivors — map-side-combinable
    // groupBy on the content hash + a hash-keyed rejoin. NOT a window: a
    // window partitioned by the hash puts a whole duplicate family in one
    // task, and web-scale corpora have families with millions of copies;
    // the partial aggregate bounds per-task state under any family mass and
    // the join streams the probe side (both reads of `qual` hit the
    // persisted `scored` cache).
    val qual = scored.filter(col("quality") >= qualityThreshold)
      .withColumn("__h", Portable.md5Hex(col("text")))
    val surv = qual.groupBy(col("__h")).agg(min(col("doc_id")).as("surv_id"))
    val ex = qual.join(surv, "__h").drop("__h")
    val exdup = ex.filter(col("doc_id") =!= col("surv_id"))
      .select(col("doc_id"), col("quality"),
        lit("exact_dup").as("status"), col("surv_id").as("survivor"))
    // Stage 3: near dedup over the ALIVE set only — shingle+LSH+verify work
    // scales with what survived stages 1-2, not the raw corpus.
    val alive = graft.CacheScope.persisted(
      ex.filter(col("doc_id") === col("surv_id"))
        .select(col("doc_id"), col("text"), col("quality")))
    val pairs = D4NgramJaccard.verifiedPairsFrom(graft.CacheScope.persisted(
      TextOps.shingleHashSets(alive.select(col("doc_id"), col("text")))))
    val comp = graft.operators.ConnectedComponents.minLabel(
      spark, pairs.select(col("doc_a"), col("doc_b")),
      edgePartitions, maxRounds, name)
    // Stage 4: dispositions. comp covers only pair-involved docs; the rest
    // of `alive` keeps itself.
    val rest = alive.join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), col("quality"),
        when(col("label").isNotNull && col("label") =!= col("doc_id"), lit("near_dup"))
          .otherwise(lit("kept")).as("status"),
        when(col("label").isNotNull && col("label") =!= col("doc_id"), col("label"))
          .otherwise(col("doc_id")).as("survivor"))
    lowq.unionByName(exdup).unionByName(rest)
  }

  /** CTE chain (requires WITH RECURSIVE) ending in the disposition inputs:
    * `qsc` (scored corpus), `ex` (exact-dedup survivors), `alive`
    * (post-exact alive set), `comp` (near-dup components). Shared with p4's
    * end-to-end assembly oracle.
    */
  private[queries] val dispositionCtesSql: String = dispositionCtesSqlOver("documents")

  /** Source-parameterized form (`src` exposes doc_id, text): the whole p1
    * chain over a derived corpus CTE — p11 runs it over the CDC-merged
    * snapshot.
    */
  private[queries] def dispositionCtesSqlOver(src: String): String =
    s"""${D4NgramJaccard.pairsCtesSql(src)},
       |${T2Quality.scoreSqlCte(src, "qsc")},
       |qual AS (
       |  SELECT doc_id, text, round(quality, 6) AS quality FROM qsc
       |  WHERE round(quality, 6) >= $qualityThreshold),
       |ex AS (
       |  SELECT doc_id, quality, min(doc_id) OVER (PARTITION BY md5(text)) AS surv_id
       |  FROM qual),
       |alive AS (SELECT doc_id, quality FROM ex WHERE doc_id = surv_id),
       |nd AS (
       |  SELECT doc_a, doc_b FROM d4
       |  WHERE doc_a IN (SELECT doc_id FROM alive)
       |    AND doc_b IN (SELECT doc_id FROM alive)),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM nd
       |  UNION ALL SELECT doc_b, doc_a FROM nd),
       |lab AS (
       |  SELECT DISTINCT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e.dst, l.label FROM lab l JOIN edges e ON l.node = e.src),
       |comp AS (SELECT node, min(label) AS component FROM lab GROUP BY node)""".stripMargin

  val oracle = Some(
    s"""WITH RECURSIVE $dispositionCtesSql
       |SELECT doc_id, round(quality, 6) AS quality, 'low_quality' AS status,
       |       CAST(NULL AS BIGINT) AS survivor
       |FROM qsc WHERE round(quality, 6) < $qualityThreshold
       |UNION ALL
       |SELECT doc_id, quality, 'exact_dup' AS status, surv_id AS survivor
       |FROM ex WHERE doc_id <> surv_id
       |UNION ALL
       |SELECT a.doc_id, a.quality,
       |       CASE WHEN c.component IS NOT NULL AND c.component <> a.doc_id
       |            THEN 'near_dup' ELSE 'kept' END AS status,
       |       CASE WHEN c.component IS NOT NULL AND c.component <> a.doc_id
       |            THEN c.component ELSE a.doc_id END AS survivor
       |FROM alive a LEFT JOIN comp c ON a.doc_id = c.node""".stripMargin)
}
