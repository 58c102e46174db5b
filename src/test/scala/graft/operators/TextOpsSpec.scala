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

  test("identical texts get identical minhash signatures (exact dups always become candidates)") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val sig = df.select((0 until 8).map(s =>
      TextOps.minhash(TextOps.shingles(TextOps.tokens(col("text")), 3), s).as(s"m$s")): _*)
      .collect()
    assert(sig(0) == sig(1))
  }
}
