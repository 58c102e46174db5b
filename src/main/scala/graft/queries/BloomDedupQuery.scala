package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** d8: Bloom-filter membership probe against a reference corpus — the
  * approximate-dedup primitive for INCREMENTAL ingestion: new documents are
  * probed against a filter built from the already-ingested corpus; a miss
  * PROVES the document unseen (zero false negatives), and only hits go to
  * exact verification (d1's hash groupBy on the hit subset). This is how a
  * training-data pipeline avoids re-shuffling 100 TB of history to admit a
  * 0.1 TB increment.
  *
  * Construction (all engine-portable, no UDFs):
  *   - fingerprint: the t4 normalized-content hash ([[Portable.hash60]]);
  *   - k=3 bit positions bit-sliced from the 60-bit fingerprint (12 bits
  *     each at offsets 0/20/40 — independent slices of one strong hash, the
  *     standard double-hashing shortcut from the Bloom literature);
  *   - the m=4096-bit filter is materialized as 128 × 32-bit words via a
  *     grouped `bit_or` — a DISTRIBUTED build (partial bit_or on every
  *     partition, tiny final merge), no driver-side filter object;
  *   - the probe side explodes its 3 positions and broadcast-joins the
  *     128-row word table; a document hits iff all 3 bits are set.
  *
  * Scale: the filter build is one pass over the reference corpus reduced to
  * m/32 rows (map-side combined); the probe is a broadcast join — the 100 TB
  * probe side never shuffles. m grows with |corpus| (m ≈ 1.44·n·log2(1/p))
  * while the word table stays ≤ MB-scale, exactly the industrial shape.
  * False positives are deterministic here (fixed hash family on both
  * engines), so the oracle reproduces them bit-for-bit.
  *
  * Reference/probe split: even doc_ids are the "already ingested" corpus,
  * odd doc_ids the increment — a deterministic stand-in for the
  * ingestion-time boundary.
  */
object D8BloomDedup extends GraftQuery {
  val name = "d8_bloom_dedup"
  val describe = "Bloom-filter probe of new docs against a reference corpus (m=4096, k=3)"

  private val mBits = 4096
  private val wordBits = 32
  /** Bit offsets of the three 12-bit position slices within the 60-bit
    * fingerprint (4096 = 2^12 positions each).
    */
  private val sliceOffsets = Seq(0, 20, 40)

  private def fingerprint(text: org.apache.spark.sql.Column) =
    Portable.hash60(Portable.normalizedText(text))

  private def fingerprintSql(text: String) =
    Portable.hash60Sql(Portable.normalizedTextSql(text))

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), fingerprint(col("text")).as("h"))
    val positions = explode(array(sliceOffsets.map(o =>
      shiftright(col("h"), o).bitwiseAND(mBits - 1)): _*)).as("pos")
    // Word index / in-word mask via shifts (integer division through `/` is
    // a portability trap: Spark's `/` is double division and DuckDB's CAST
    // rounds where Spark truncates; `>>`/`&` agree exactly). The functions
    // API only takes literal shift amounts, hence expr() for the mask.
    val wordCol = shiftright(col("pos"), 5).as("word")
    val maskCol = expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pos & ${wordBits - 1} AS INT))").as("mask")
    // Distributed filter build: position → (word, set-bit), OR-folded into
    // m/32 words. bit_or partially aggregates before the (tiny) shuffle.
    val bloom = docs.filter(col("doc_id") % 2 === 0)
      .select(positions)
      .select(wordCol, maskCol)
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
    // Probe: 3 rows per doc, broadcast join on word index, hit iff every
    // probed bit is set (a missing word row means the bit is unset).
    val probed = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), positions)
      .select(col("doc_id"), wordCol, maskCol)
      .join(broadcast(bloom), Seq("word"), "left")
      .select(col("doc_id"),
        (coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) =!= 0).as("hit"))
    probed.groupBy(col("doc_id"))
      .agg((sum(when(col("hit"), 0L).otherwise(1L)) === 0).as("bloom_hit"))
  }

  val oracle = {
    val posList = sliceOffsets.map(o => s"(h >> $o) & ${mBits - 1}").mkString(", ")
    Some(
      s"""WITH fp AS (SELECT doc_id, ${fingerprintSql("text")} AS h FROM documents),
         |refpos AS (
         |  SELECT unnest([$posList]) AS pos FROM fp WHERE doc_id % 2 = 0),
         |bloom AS (
         |  SELECT pos >> 5 AS word,
         |         bit_or(CAST(1 AS BIGINT) << CAST(pos & ${wordBits - 1} AS INT)) AS bits
         |  FROM refpos GROUP BY 1),
         |probe AS (
         |  SELECT doc_id, unnest([$posList]) AS pos FROM fp WHERE doc_id % 2 = 1),
         |hits AS (
         |  SELECT p.doc_id,
         |         (COALESCE(b.bits, 0) & (CAST(1 AS BIGINT) << CAST(p.pos & ${wordBits - 1} AS INT))) <> 0 AS hit
         |  FROM probe p LEFT JOIN bloom b ON p.pos >> 5 = b.word)
         |SELECT doc_id, bool_and(hit) AS bloom_hit FROM hits GROUP BY doc_id""".stripMargin)
  }
}
