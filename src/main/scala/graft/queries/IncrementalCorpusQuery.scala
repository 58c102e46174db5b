package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.SnapshotMerge

/** p11: the INCREMENTAL corpus cycle — the recrawl loop a 100-TB deployment
  * actually runs, as ONE declared query: today's crawl delta is CDC-merged
  * into yesterday's snapshot (q27's `mergeCdc`: updates re-texted, inserts
  * added, tombstones removed), and the FULL p1 cleaning pipeline (quality
  * gate → exact dedup → LSH near-dup collapse → dispositions) runs over
  * the MERGED corpus. This is the composition q25's scaladoc promises
  * ("today's crawl is a delta against yesterday's release") made
  * executable and oracle-gated: the merge's disposition algebra feeds the
  * clean's disposition algebra, and a mistake at the seam — cleaning the
  * unmerged corpus, leaking a tombstoned doc, losing an updated doc's new
  * text — flips the hash.
  *
  * Derivation (doc_id-keyed hash carve-outs, every branch massed):
  * base = docs with h%7 ≠ 0; delta = docs with h%3 = 0, re-texted with an
  * " updated revision" suffix (so updated docs' shingles/quality/dedup
  * hashes genuinely change), tombstoned when h%5 = 0. The merged corpus
  * drops deleted docs (release-filter semantics) and no-op tombstones
  * vanish by construction.
  *
  * Scale shape: ONE full-outer keyed merge join (bucketable/co-locatable —
  * BucketingSpec proves the zero-shuffle nightly form) feeding p1's own
  * stage shapes; the clean chain runs over the merged survivor set only.
  *
  * Oracle: q27's merge CTE producing a `mdoc` relation, then p1's ENTIRE
  * disposition chain source-parameterized onto it
  * ([[P1CleanCorpus.dispositionCtesSqlOver]]) — byte-identical stage SQL,
  * different corpus.
  */
object P11IncrementalCorpus extends GraftQuery {
  val name = "p11_incremental_corpus"
  val describe = "recrawl cycle: CDC-merge the delta into the snapshot, then full p1 clean over it"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Portable.hash60(concat(lit("inc:"), col("doc_id").cast("string")))
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"), h.as("h"))
    val base = docs.filter(col("h") % 7 =!= 0)
      .select(col("doc_id"), col("source"), col("text"))
    val delta = docs.filter(col("h") % 3 === 0)
      .select(col("doc_id"), col("source"),
        concat(col("text"), lit(" updated revision")).as("text"),
        (col("h") % 5 === 0).as("deleted"))
    val merged = SnapshotMerge
      .mergeCdc(base, delta, "doc_id", Seq("source", "text"))
      .filter(col("disposition") =!= "deleted")
      .select(col("doc_id"), col("source"), col("text"))
    P1CleanCorpus.runOn(spark, merged)
  }

  val oracle = {
    val h = Portable.hash60Sql("'inc:' || doc_id")
    Some(
      s"""WITH RECURSIVE ih AS (
         |  SELECT doc_id, source, text, $h AS h FROM documents),
         |ibase AS (
         |  SELECT doc_id, source, text FROM ih WHERE h % 7 <> 0),
         |idelta AS (
         |  SELECT doc_id, source, text || ' updated revision' AS text,
         |         h % 5 = 0 AS tomb
         |  FROM ih WHERE h % 3 = 0),
         |mdoc AS (
         |  SELECT coalesce(b.doc_id, d.doc_id) AS doc_id,
         |         CASE WHEN d.doc_id IS NOT NULL AND NOT d.tomb
         |              THEN d.text ELSE b.text END AS text
         |  FROM ibase b FULL OUTER JOIN idelta d ON b.doc_id = d.doc_id
         |  WHERE d.doc_id IS NULL OR NOT d.tomb),
         |${P1CleanCorpus.dispositionCtesSqlOver("mdoc")}
         |SELECT doc_id, round(quality, 6) AS quality, 'low_quality' AS status,
         |       CAST(NULL AS BIGINT) AS survivor
         |FROM qsc WHERE round(quality, 6) < ${P1CleanCorpus.qualityThreshold}
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
}
