package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** Exact deduplication over `documents`: content-hash groupBy, emitting one
  * row per distinct content with its multiplicity and the canonical survivor
  * (lowest doc_id).
  *
  * Scale: a single hash-partitioned aggregate on a 32-byte key — the
  * canonical 100 TB dedup shape. Map-side partial aggregation collapses
  * per-partition duplicates before the shuffle; AQE coalesces the post-shuffle
  * partitions. No sort, no window, no driver state.
  */
object D1ExactDedup extends GraftQuery {
  val name = "d1_exact_dedup"
  val describe = "exact dedup: md5(content) groups with count + canonical keeper"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .groupBy(Portable.md5Hex(col("text")).as("h"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("keep_id"))

  val oracle = Some(
    """SELECT md5(text) AS h, count(*) AS n_dups, min(doc_id) AS keep_id
      |FROM documents
      |GROUP BY 1""".stripMargin)
}

/** Document fingerprinting: md5 over whitespace-normalized, lowercased text —
  * robust to formatting-only edits. A narrow, codegen'd projection; at scale
  * this is scan-bound and the fingerprint column is what downstream exact
  * dedup / lineage joins key on.
  */
object T4Fingerprint extends GraftQuery {
  val name = "t4_fingerprint"
  val describe = "normalized-content fingerprint (lower + whitespace collapse + md5)"

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      Portable.md5Hex(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))

  // DuckDB regexp_replace replaces only the first match unless the 'g' flag
  // is passed; Spark always replaces all — hence the explicit flag here.
  val oracle = Some(
    """SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin)
}
