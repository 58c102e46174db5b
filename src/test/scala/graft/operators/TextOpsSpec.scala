package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens: lowercases, splits on non-alphanumerics, drops empties") {
    val got = one("Key AGG,row1  scan!").select(TextOps.tokens(col("text"))).head.getSeq[String](0)
    assert(got == Seq("key", "agg", "row1", "scan"))
  }

  test("shingles: n-2 3-grams in order; short docs yield empty, not descending-sequence garbage") {
    val sh = (t: String) => one(t)
      .select(TextOps.shingles(TextOps.tokens(col("text")), 3)).head.getSeq[String](0)
    assert(sh("a b c d") == Seq("a b c", "b c d"))
    assert(sh("a b") == Seq.empty)
    assert(sh("") == Seq.empty)
  }

  test("minhash: stable, null on empty shingle set, monotone under union") {
    val m = (t: String) => one(t)
      .select(TextOps.minhash(TextOps.shingles(TextOps.tokens(col("text")), 3), 0)).head
    assert(m("a b c d").getLong(0) == m("a b c d").getLong(0))
    assert(m("a b").isNullAt(0))
    // min over a superset of shingles can only be <= the subset's min.
    assert(m("a b c d e f").getLong(0) <= m("a b c d").getLong(0))
  }

  test("portable hash60 is non-negative and stable") {
    val vals = one("abc").select(
      Portable.hash60(col("text")),
      Portable.hash60(col("text"), 1),
      Portable.hash60(col("text"), 2)).head
    assert((0 to 2).map(vals.getLong).forall(_ >= 0))
    assert(vals.getLong(1) != vals.getLong(2), "seeds must decorrelate")
  }

  test("hashed shingles match an independent Scala reimplementation bit-for-bit") {
    // Independent arithmetic: md5 via MessageDigest, 15-hex-char prefix,
    // token hashes mod 2^31-1, two 31-bit linear combines packed to 62 bits
    // — written from the SPEC in TextOps's scaladoc, not from its Column
    // code, so a silent refactor of either side breaks this before the
    // DuckDB oracle round would catch it.
    val P = 2147483647L
    val cA = Seq(1299709L, 15485863L, 32452843L)
    val cB = Seq(86028121L, 104395301L, 122949823L)
    import graft.IndependentHash.md5hash60
    def reference(text: String): Seq[Long] = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      val ht = toks.map(t => md5hash60(t) % P)
      if (ht.length < 3) Seq.empty
      else ht.sliding(3).map { w =>
        val a = w.zip(cA).map { case (h, c) => (h * c) % P }.sum % P
        val b = w.zip(cB).map { case (h, c) => (h * c) % P }.sum % P
        a * (P + 1) + b
      }.toSeq
    }
    for (text <- Seq(
        "the quick brown fox jumps over the lazy dog",
        "a b c", "a b", "", "Repeat repeat REPEAT repeat words",
        "numbers 123 mix4ed 567 and punctuation!!!")) {
      val got = one(text)
        .select(TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col("text"))), 3))
        .head.getSeq[Long](0)
      assert(got == reference(text), s"mismatch for: '$text'")
    }
  }

  test("identical texts get identical minhash signatures (exact dups always become candidates)") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val sig = df.select((0 until 8).map(s =>
      TextOps.minhash(TextOps.shingles(TextOps.tokens(col("text")), 3), s).as(s"m$s")): _*)
      .collect()
    assert(sig(0) == sig(1))
  }
}
