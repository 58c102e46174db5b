package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** p1's status branches on a synthetic fixture. The driver corpus has zero
  * exact duplicates (500/500 distinct md5 at every SF), so the exact_dup
  * branch — and the exact→near chaining (a duplicate's survivor itself
  * collapsed by the near-dup stage) — is only provable here.
  */
class CleanCorpusSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private lazy val out = {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day in the field"),
      (2L, "a b c d!!!! ...,;;;; !!?? ...."),
      (10L, "the cat sat on the mat and it was happy to be in the warm sun of the morning"),
      (11L, "the cat sat on the mat and it was happy to be in the warm sun of the morning"),
      (12L, "the cat sat on the mat and it was happy to be in the warm sun of the evening"),
      (20L, "numbers and letters mixed in a long story about the sea and the ships that sail it daily")
    ).toDF("doc_id", "text")
    P1CleanCorpus.runOn(spark, docs)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
  }

  test("every input document gets exactly one disposition row") {
    assert(out.keySet == Set(1L, 2L, 10L, 11L, 12L, 20L))
  }

  test("punctuation-heavy doc is dropped by the quality gate with no survivor") {
    assert(out(2L) == ("low_quality", None))
  }

  test("identical copy is an exact_dup pointing at the canonical min id") {
    assert(out(11L) == ("exact_dup", Some(10L)))
  }

  test("one-token variant is a near_dup collapsed onto the exact survivor") {
    // 12's pair partner is 10 — the doc that ALSO won the exact group
    // {10, 11}: the stages chain, dropping 11 before LSH ever sees it.
    assert(out(12L) == ("near_dup", Some(10L)))
  }

  test("unique quality docs are kept and survive as themselves") {
    assert(out(1L) == ("kept", Some(1L)))
    assert(out(10L) == ("kept", Some(10L)))
    assert(out(20L) == ("kept", Some(20L)))
  }
}
