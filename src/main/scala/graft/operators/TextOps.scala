package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Tokenization / shingling / minhash building blocks for the document
  * pipeline, as Column expressions with exact DuckDB SQL mirrors. Everything
  * here is executor-local array work (no UDFs, no shuffles) — the shuffles
  * happen only at the dedup joins that consume these columns.
  *
  * The reference has no text processing at all; this is the training-data
  * pipeline extension surface (builder brief), designed so each derived
  * column is recomputable on any executor from the row alone — the property
  * that lets dedup scale by pure hash-partitioning at 100 TB.
  */
object TextOps {

  /** Lowercased alphanumeric word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokensSql(text: String): String =
    s"list_filter(string_split_regex(lower($text), '[^a-z0-9]+'), x -> x <> '')"

  /** Word n-gram shingles joined by single spaces; empty when the document
    * has fewer than n tokens.
    *
    * Implementation note: built as `transform(arrays_zip(slice₁..sliceₙ))`
    * so the lambda only touches its BOUND zipped element. The naive
    * `transform(sequence(...), i => element_at(toks, i+j))` re-evaluates the
    * whole `toks` expression tree per element (Catalyst binds only the
    * transform target, not captured columns) — tokenizing every document
    * once per shingle per gram, which turned an O(tokens) projection into
    * O(tokens²) and dominated the minhash pipeline at sf0.1.
    */
  def shingles(toks: Column, n: Int): Column = {
    val m = size(toks) - (n - 1)
    val zipped = arrays_zip((1 to n).map(j => slice(toks, lit(j), m)): _*)
    when(size(toks) >= n,
      transform(zipped, s => concat_ws(" ", (0 until n).map(j => s.getField(s"$j")): _*)))
      .otherwise(array().cast("array<string>"))
  }

  def shinglesSql(toks: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$toks[i + $j]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${n - 2}, 1)), i -> $parts)"
  }

  /** Minhash value for one seeded hash over a shingle array (null when the
    * array is empty — callers filter those documents out on both sides).
    */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s => Portable.hash60(concat(lit(s"$seed:"), s))))

  def minhashSql(shingles: String, seed: Int): String =
    s"list_min(list_transform($shingles, s -> ${Portable.hash60Sql(s"'$seed:' || s")}))"

  // ---- Scalable minhash signatures (one md5 per shingle, k mixes) ----

  /** Mersenne prime 2^31−1: keeps a_i·base within int64. */
  val MinhashPrime = 2147483647L

  /** Seeded (a, b) pairs for the linear-congruential hash family
    * h_i(x) = (a_i·x + b_i) mod p — the classic k-minhash construction that
    * needs ONE strong base hash per shingle instead of k of them.
    */
  def minhashParams(k: Int, seed: Long = 1234L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Signature frame (doc_id, m0..m{k−1}) for all documents with ≥1 shingle.
    * Shape: explode distinct shingles (tokenize+shingle once per doc) → one
    * md5-derived base hash per shingle → grouped min of k integer mixes.
    * One shuffle on doc_id; everything else executor-local and codegen'd.
    */
  def minhashSignatures(docs: org.apache.spark.sql.DataFrame, k: Int, n: Int = 3)
      : org.apache.spark.sql.DataFrame = {
    val params = minhashParams(k)
    val base = Portable.hash60(col("shingle")) % MinhashPrime
    docs
      .select(col("doc_id"),
        explode(array_distinct(shingles(tokens(col("text")), n))).as("shingle"))
      .select(col("doc_id"), base.as("base"))
      .groupBy(col("doc_id"))
      .agg(
        min((col("base") * params.head._1 + params.head._2) % MinhashPrime).as("m0"),
        params.tail.zipWithIndex.map { case ((a, b), i) =>
          min((col("base") * a + b) % MinhashPrime).as(s"m${i + 1}")
        }: _*)
  }

  /** DuckDB mirror of [[minhashSignatures]] as a WITH-clause body over
    * `documents`; emits a relation (doc_id, m0..m{k−1}).
    */
  def minhashSignaturesSql(k: Int, n: Int = 3): String = {
    val params = minhashParams(k)
    val mins = params.zipWithIndex
      .map { case ((a, b), i) => s"min((base * $a + $b) % $MinhashPrime) AS m$i" }
      .mkString(", ")
    s"""ex AS (
       |  SELECT doc_id, unnest(list_distinct(${shinglesSql("t", n)})) AS shingle
       |  FROM (SELECT doc_id, ${tokensSql("text")} AS t FROM documents)),
       |bh AS (SELECT doc_id, ${Portable.hash60Sql("shingle")} % $MinhashPrime AS base FROM ex),
       |sig AS (SELECT doc_id, $mins FROM bh GROUP BY doc_id)""".stripMargin
  }
}
