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

  // ---- Hashed shingles (the scale path for d2/d3/d4) ----
  //
  // The naive pipeline hashes every shingle STRING (md5 of ~3 joined tokens,
  // built by concat_ws): one fresh string allocation + one md5 per shingle.
  // At 100 TB that is the dominant cost of the whole dedup family. The
  // hashed-shingle path instead computes ONE md5 per token and derives each
  // shingle's hash arithmetically from its n token hashes — no shingle
  // strings ever exist. Two independent 31-bit linear combinations are
  // packed into one 62-bit value so downstream consumers (simhash bit votes,
  // minhash mixes, set intersection) still see a wide uniform hash. All
  // arithmetic stays below 2^63 so the DuckDB oracle (which errors on BIGINT
  // overflow rather than wrapping) computes bit-identical values.

  /** Modulus for per-token hashes and combine terms: Mersenne prime 2^31−1. */
  val TokenPrime: Long = 2147483647L

  /** Fixed odd multipliers for the two 31-bit shingle combines (any fixed
    * constants < 2^31 work; primes chosen for mixing quality).
    */
  private val CoefA = Seq(1299709L, 15485863L, 32452843L, 49979687L, 67867967L)
  private val CoefB = Seq(86028121L, 104395301L, 122949823L, 141650939L, 160481183L)

  /** One 31-bit portable hash per token — the only cryptographic work in the
    * hashed-shingle pipeline (one md5 per token; the lambda touches only its
    * bound element, so nothing is re-evaluated per element).
    */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => Portable.hash60(t) % TokenPrime)

  def tokenHashesSql(toks: String): String =
    s"list_transform($toks, t -> ${Portable.hash60Sql("t")} % $TokenPrime)"

  /** 62-bit hash per word-n-gram shingle, derived from the token-hash array
    * `ht`. Each shingle yields two 31-bit combines cA/cB of its n token
    * hashes, packed as cA·2^31 + cB. Empty when the document has < n tokens.
    *
    * The construction needs ~7 references to `ht` (slice targets, lengths).
    * If those referenced the md5 transform directly, CollapseProject would
    * inline it into every reference and codegen's subexpression elimination
    * cannot hoist higher-order-function trees — the corpus would be
    * tokenized+hashed 7×, not once (measured: 5× wall-clock on d2/d3). So
    * `ht` is bound ONCE as a lambda variable (`transform(array(ht), a => …)`)
    * and every inner reference reads the bound variable — O(1) evaluations
    * of the expensive subtree no matter what the optimizer collapses.
    */
  def shingleHashes(ht: Column, n: Int): Column = {
    require(n <= CoefA.length, s"shingleHashes supports n <= ${CoefA.length}")
    def inner(a: Column): Column = {
      val m = size(a) - (n - 1)
      val zipped = arrays_zip((1 to n).map(j => slice(a, lit(j), m)): _*)
      val combine = (s: Column) => {
        val fields = (0 until n).map(j => s.getField(s"$j"))
        val cA = fields.zip(CoefA).map { case (f, c) => (f * c) % TokenPrime }
          .reduce(_ + _) % TokenPrime
        val cB = fields.zip(CoefB).map { case (f, c) => (f * c) % TokenPrime }
          .reduce(_ + _) % TokenPrime
        cA * (TokenPrime + 1) + cB // TokenPrime+1 = 2^31: pack to 62 bits
      }
      when(size(a) >= n, transform(zipped, combine))
        .otherwise(array().cast("array<bigint>"))
    }
    flatten(transform(array(ht), a => inner(a)))
  }

  /** DuckDB mirror of [[shingleHashes]] over a token-hash list column. */
  def shingleHashesSql(ht: String, n: Int): String = {
    def lin(coefs: Seq[Long]): String =
      "(" + (0 until n)
        .map(j => s"(($ht[i + $j] * ${coefs(j)}) % $TokenPrime)")
        .mkString(" + ") + s") % $TokenPrime"
    s"list_transform(range(1, greatest(len($ht) - ${n - 2}, 1)), " +
      s"i -> (${lin(CoefA)}) * ${TokenPrime + 1} + (${lin(CoefB)}))"
  }

  // ---- Wide-window rolling grams (d18 exact-substring dedup) ----
  //
  // ExactSubstr-style dedup (Lee et al. 2022, "Deduplicating Training Data
  // Makes Language Models Better") needs k-TOKEN window hashes for k well
  // beyond shingleHashes' 5-coefficient limit (the published threshold is 50
  // BPE tokens). Each window hash is two independent polynomial folds of the
  // token hashes mod TokenPrime, packed to 62 bits exactly like
  // shingleHashes — one md5 per token, arithmetic only per window, and
  // every intermediate stays < 2^63 so the DuckDB oracle (which errors on
  // BIGINT overflow) computes bit-identical values.

  /** Polynomial multipliers for the two independent window combines (any
    * fixed constants < 2^31; primes for mixing quality).
    */
  private val GramA = 1000003L
  private val GramB = 1000033L

  /** 62-bit hash per k-token window over the token-hash array `ht`:
    * position i (1-based) hashes tokens i..i+k−1. Empty when the document
    * has < k tokens. Each window folds its k token hashes twice
    * (h = ((t₁·A + t₂)·A + t₃)… mod P with A ∈ {GramA, GramB}) and packs
    * cA·2^31 + cB.
    *
    * Binding: `ht` is bound ONCE as a lambda variable (the shingleHashes
    * trick) so the expensive md5 subtree is never re-evaluated per window;
    * the per-window work is a k-element slice + two O(k) folds —
    * O(tokens·k) per document, executor-local, no shuffle. (A custom codegen
    * Expression could make this O(tokens) with the true rolling update
    * h′ = (h − t_i·A^{k−1})·A + t_{i+k}; at k ≤ 50 the slice form is within
    * ~2× of that and stays whole-stage-codegen'd built-ins.)
    */
  def gramHashes(ht: Column, k: Int): Column = {
    require(k >= 2, s"gramHashes requires k >= 2, got $k")
    // Round 15: routed through the native rolling expression — the O(tokens)
    // form this scaladoc previously only described. Values are bit-identical
    // (GramHashSpec pins equality against [[gramHashesComposed]] including
    // the empty-array-for-short/null-input contract); the per-window
    // 2×O(k) slice folds become one O(1) rolling update.
    org.apache.spark.sql.graft.GramHash.gramHashCol(ht, k)
  }

  /** The pre-round-15 built-ins form of [[gramHashes]] — kept as the
    * equality witness GramHashSpec compares the native expression against.
    */
  private[graft] def gramHashesComposed(ht: Column, k: Int): Column = {
    require(k >= 2, s"gramHashesComposed requires k >= 2, got $k")
    def inner(a: Column): Column = {
      val m = size(a) - (k - 1)
      val window = (i: Column) => slice(a, i, lit(k))
      val fold = (w: Column, mult: Long) =>
        aggregate(w, lit(0L), (acc, x) => (acc * mult + x) % TokenPrime)
      when(size(a) >= k,
        transform(sequence(lit(1), m), i =>
          fold(window(i), GramA) * (TokenPrime + 1) + fold(window(i), GramB)))
        .otherwise(array().cast("array<bigint>"))
    }
    flatten(transform(array(ht), a => inner(a)))
  }

  /** DuckDB mirror of [[gramHashes]]. `list_reduce` seeds with the FIRST
    * element where Spark's `aggregate` seeds 0; they coincide because
    * f(0, t₁) = (0·A + t₁) mod P = t₁ (the t7 argument), and the slice is
    * never empty (range stops at len−k+1).
    */
  def gramHashesSql(ht: String, k: Int): String = {
    require(k >= 2, s"gramHashesSql requires k >= 2, got $k")
    def fold(mult: Long) =
      s"list_reduce($ht[i : i + ${k - 1}], (a, b) -> ((a * $mult) + b) % $TokenPrime)"
    s"list_transform(range(1, greatest(len($ht) - ${k - 2}, 1)), " +
      s"i -> ${fold(GramA)} * ${TokenPrime + 1} + ${fold(GramB)})"
  }

  /** Per-document distinct hashed-shingle sets: (doc_id, shs array<long>).
    * The shared first stage of d2/d3/d4 — tokenize once, one md5 per token,
    * arithmetic shingle hashes, distinct. Callers persist this frame when
    * they consume it more than once (Spark's cache manager matches by
    * logical plan, so independently-built copies share one materialization).
    */
  def shingleHashSets(docs: org.apache.spark.sql.DataFrame, n: Int = 3)
      : org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), tokenHashes(tokens(col("text"))).as("ht"))
      .select(col("doc_id"), array_distinct(shingleHashes(col("ht"), n)).as("shs"))

  /** DuckDB mirror of [[shingleHashSets]] as a WITH-clause body; emits a
    * relation `shs(doc_id, shs)`.
    */
  def shingleHashSetsSql(n: Int = 3): String = shingleHashSetsSql("documents", n)

  /** Source-parameterized form (`src` must expose doc_id, text) — lets a
    * composed oracle (p11's merged snapshot) run the whole shingle→LSH→
    * dedup chain over a derived corpus CTE instead of the raw table.
    */
  def shingleHashSetsSql(src: String, n: Int): String =
    s"""th AS (SELECT doc_id, ${tokenHashesSql(tokensSql("text"))} AS ht FROM $src),
       |shs AS (SELECT doc_id, list_distinct(${shingleHashesSql("ht", n)}) AS shs FROM th)""".stripMargin

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

  /** Signature frame (doc_id, m0..m{k−1}) for all documents with ≥1 shingle,
    * built from a hashed-shingle frame (see [[shingleHashSets]]). Shape:
    * explode distinct shingle hashes → grouped min of k integer mixes. One
    * shuffle on doc_id; everything else executor-local and codegen'd.
    */
  def minhashSignaturesFromHashes(shs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val params = minhashParams(k)
    shs
      .select(col("doc_id"), explode(col("shs")).as("sh"))
      .select(col("doc_id"), (col("sh") % MinhashPrime).as("base"))
      .groupBy(col("doc_id"))
      .agg(
        min((col("base") * params.head._1 + params.head._2) % MinhashPrime).as("m0"),
        params.tail.zipWithIndex.map { case ((a, b), i) =>
          min((col("base") * a + b) % MinhashPrime).as(s"m${i + 1}")
        }: _*)
  }

  /** DuckDB mirror of [[minhashSignaturesFromHashes]] composed over
    * [[shingleHashSetsSql]]; emits relations `th, shs, bh, sig` where
    * sig = (doc_id, m0..m{k−1}).
    */
  def minhashSignaturesSql(k: Int, n: Int = 3): String =
    minhashSignaturesSql("documents", k, n)

  /** Source-parameterized twin of [[minhashSignaturesSql]] (see
    * [[shingleHashSetsSql]]'s src contract).
    */
  def minhashSignaturesSql(src: String, k: Int, n: Int): String = {
    val params = minhashParams(k)
    val mins = params.zipWithIndex
      .map { case ((a, b), i) => s"min((base * $a + $b) % $MinhashPrime) AS m$i" }
      .mkString(", ")
    s"""${shingleHashSetsSql(src, n)},
       |bh AS (SELECT doc_id, unnest(shs) % $MinhashPrime AS base FROM shs),
       |sig AS (SELECT doc_id, $mins FROM bh GROUP BY doc_id)""".stripMargin
  }
}
