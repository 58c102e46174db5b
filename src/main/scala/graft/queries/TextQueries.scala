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
      Portable.md5Hex(Portable.normalizedText(col("text"))).as("fp"))

  val oracle = Some(
    s"""SELECT doc_id, md5(${Portable.normalizedTextSql("text")}) AS fp
       |FROM documents""".stripMargin)
}

/** t7: POLYNOMIAL ROLLING fingerprint — order-sensitive token-sequence hash
  * h = ((…(t₁·A + t₂)·A + t₃)…) mod P over the per-token portable hashes.
  * Complements t4 (whole-content md5): the rolling form is incremental —
  * chunked/streamed ingestion can extend it without re-reading the prefix,
  * and two documents agree iff their token SEQUENCES agree (t4 is
  * whitespace-normalized character equality).
  *
  * Engine parity note: Spark's `aggregate(ht, 0L, f)` seeds with 0 and folds
  * every element; DuckDB's `list_reduce` seeds with the FIRST element and
  * folds the rest. These coincide exactly because f(0, t₁) = (0·A + t₁) mod
  * P = t₁ — and DuckDB errors on empty lists where Spark returns the seed,
  * hence the CASE guard on the oracle side (token-less docs fingerprint 0 on
  * both engines).
  */
object T7RollingFingerprint extends GraftQuery {
  val name = "t7_rolling_fp"
  val describe = "polynomial rolling fingerprint over the token-hash sequence"

  private val A = 1000003L
  private val P = graft.operators.TextOps.TokenPrime

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.TextOps
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      aggregate(TextOps.tokenHashes(TextOps.tokens(col("text"))), lit(0L),
        (acc, x) => (acc * A + x) % P).as("fp"))
  }

  val oracle = {
    import graft.operators.TextOps
    val ht = TextOps.tokenHashesSql(TextOps.tokensSql("text"))
    Some(
      s"""WITH th AS (SELECT doc_id, $ht AS ht FROM documents)
         |SELECT doc_id,
         |       CASE WHEN len(ht) = 0 THEN 0
         |            ELSE list_reduce(ht, (a, b) -> (a * $A + b) % $P) END AS fp
         |FROM th""".stripMargin)
  }
}
