package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.TextOps

/** d2: MinHash + LSH near-duplicate candidate pairs over `documents`.
  *
  * Pipeline: word 3-gram shingles → 8 seeded minhashes → 4 bands of 2 →
  * band-bucket self-join → distinct (a<b) pairs. This is the canonical
  * 100 TB near-dedup shape: per-document signature computation is
  * executor-local and linear; the only shuffle is the band-key join, whose
  * fan-in per bucket is the collision count, never n².
  *
  * All hashing goes through the md5-based portable family
  * ([[graft.functions.Portable]]) so the DuckDB oracle reproduces the exact
  * pairs — Spark's murmur `hash()` would be ~2× faster but unverifiable;
  * production users can swap the hash via this one seam.
  */
object D2MinhashLsh extends GraftQuery {
  val name = "d2_minhash_lsh"
  val describe = "minhash(8)+LSH(4 bands) near-dup candidate pairs on 3-gram shingles"

  private val nHashes = 8
  private val bandSize = 2
  private val nBands = nHashes / bandSize

  private def signatures(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val sh = TextOps.shingles(toks, 3)
    Tables.documents(spark, sfDir)
      .select(col("doc_id") +: (0 until nHashes).map(s =>
        TextOps.minhash(sh, s).as(s"m$s")): _*)
      .filter(col("m0").isNotNull)
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = signatures(spark, sfDir)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat(col(s"m${b * bandSize}").cast("string"), lit("_"),
          col(s"m${b * bandSize + 1}").cast("string")).as("key"))
    }
    val bands = sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  val oracle = {
    val toks = TextOps.tokensSql("text")
    val sh = TextOps.shinglesSql("t", 3)
    val sigCols = (0 until nHashes).map(s => s"${TextOps.minhashSql("sh", s)} AS m$s").mkString(",\n         ")
    val bandSelects = (0 until nBands).map { b =>
      s"SELECT doc_id, $b AS band, (CAST(m${b * bandSize} AS VARCHAR) || '_' || CAST(m${b * bandSize + 1} AS VARCHAR)) AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    Some(
      s"""WITH toks AS (SELECT doc_id, $toks AS t FROM documents),
         |sh AS (SELECT doc_id, $sh AS sh FROM toks),
         |sig AS (SELECT doc_id,
         |         $sigCols
         |        FROM sh),
         |sigf AS (SELECT * FROM sig WHERE m0 IS NOT NULL),
         |bands AS (
         |  ${bandSelects.replace("FROM sig", "FROM sigf")}
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id""".stripMargin)
  }
}

/** d3: 32-bit SimHash signatures over distinct word tokens. Signature
  * computation is one explode + grouped bit-count aggregation — a single
  * shuffle on doc_id; the 32 bit-sums are plain codegen'd aggregates.
  * Documents with identical signatures are duplicate candidates; banding the
  * signature (as in d2) gives the hamming-distance scale path.
  */
object D3SimHash extends GraftQuery {
  val name = "d3_simhash"
  val describe = "32-bit simhash signature per document (distinct-token bit votes)"

  private val bits = 32

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val ex = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("tok"))
      .select(col("doc_id"), Portable.hash60(col("tok")).as("h"))
    val bitSums = (0 until bits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1)).as(s"s$j"))
    val g = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n"), bitSums: _*)
    val sim = (0 until bits).map(j =>
      when(col(s"s$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    g.select(col("doc_id"), sim.as("simhash"))
  }

  val oracle = {
    val h = Portable.hash60Sql("tok")
    val bitSums = (0 until bits).map(j => s"sum((h >> $j) & 1) AS s$j").mkString(", ")
    val simExpr = (0 until bits)
      .map(j => s"CASE WHEN s$j * 2 > n THEN ${1L << j} ELSE 0 END")
      .mkString(" + ")
    Some(
      s"""WITH ex AS (
         |  SELECT doc_id, unnest(list_distinct(${TextOps.tokensSql("text")})) AS tok
         |  FROM documents),
         |hs AS (SELECT doc_id, $h AS h FROM ex),
         |g AS (SELECT doc_id, count(*) AS n, $bitSums FROM hs GROUP BY doc_id)
         |SELECT doc_id, CAST($simExpr AS BIGINT) AS simhash FROM g""".stripMargin)
  }
}

/** d4: n-gram (3-gram shingle) Jaccard near-dup pairs with length-bucket
  * blocking.
  *
  * Blocking key = (lang, ⌊n_chars/100⌋), with each document entered into its
  * own bucket AND the next one so boundary-straddling pairs aren't lost —
  * the standard two-bucket trick; candidates stay O(bucket²·buckets), never
  * n². Jaccard is computed on distinct 3-gram shingle SETS (Spark
  * `array_intersect` and DuckDB `list_intersect` both have set semantics —
  * verified): on this corpus unigram sets saturate (shared tiny vocabulary,
  * median Jaccard 0.71) while shingle sets separate true near-dups cleanly
  * (99th percentile 0.015 vs near-dup pairs ≥ 0.3).
  */
object D4NgramJaccard extends GraftQuery {
  val name = "d4_ngram_jaccard"
  val describe = "3-gram shingle-set Jaccard >= 0.3 pairs under (lang, length-bucket) blocking"

  private val threshold = 0.3
  private val bucketChars = 100

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir).select(
      col("doc_id"), col("lang"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("toks"),
      floor(col("n_chars") / lit(bucketChars.toDouble)).cast("long").as("b0"))
    val blocked = base.select(
      col("doc_id"), col("lang"), col("toks"), size(col("toks")).as("ntok"),
      explode(array(col("b0"), col("b0") + 1)).as("blk"))
    val inter = size(array_intersect(col("a.toks"), col("b.toks")))
    blocked.alias("a")
      .join(blocked.alias("b"),
        col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (inter.cast("double") / (col("a.ntok") + col("b.ntok") - inter).cast("double")).as("jac"))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
      .distinct()
  }

  val oracle = {
    Some(
      s"""WITH tk AS (SELECT doc_id, lang, n_chars, ${TextOps.tokensSql("text")} AS t FROM documents),
         |base AS (
         |  SELECT doc_id, lang, list_distinct(${TextOps.shinglesSql("t", 3)}) AS toks,
         |         CAST(floor(n_chars / ${bucketChars}.0) AS BIGINT) AS b0
         |  FROM tk),
         |blocked AS (
         |  SELECT doc_id, lang, toks, len(toks) AS ntok, unnest([b0, b0 + 1]) AS blk
         |  FROM base)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |             / CAST(a.ntok + b.ntok - len(list_intersect(a.toks, b.toks)) AS DOUBLE), 6) AS jaccard
         |FROM blocked a JOIN blocked b
         |  ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         |      / CAST(a.ntok + b.ntok - len(list_intersect(a.toks, b.toks)) AS DOUBLE) >= $threshold""".stripMargin)
  }
}
