package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** p12 beyond the oracle: (1) the funnel's defining monotonicity and its
  * seams against the published constituent queries on the real corpus;
  * (2) a synthetic fixture where EVERY stage has differentiating mass —
  * on the driver corpus the strip stage is legitimately empty (near-dedup
  * already removed every doc whose chunks repeat, and the funnel showing
  * that IS the datasheet's finding), but a mis-wired stage 5 could hide
  * behind that emptiness, so the fixture installs a 12-token chunk shared
  * by two docs that are NOT near-duplicates (unique tails keep their
  * Jaccard far below the pair threshold) and pins the exact token
  * accounting of its removal.
  */
class AttritionFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("real corpus: monotone funnel whose stages equal the published queries' counts") {
    val f = rows(P12AttritionFunnel.run(spark, TestSpark.sf0001))
    assert(f.keySet == (0L to 6L).toSet)
    (0L to 5L).foreach { i =>
      val (_, d0, t0) = f(i); val (_, d1, t1) = f(i + 1)
      assert(d1 <= d0 && t1 <= t0, s"stage ${i + 1} grew: $d0->$d1 docs, $t0->$t1 tokens")
    }
    val p1Kept = P1CleanCorpus.run(spark, TestSpark.sf0001)
      .filter(col("status") === "kept").count()
    val p5Kept = P5Decontaminated.run(spark, TestSpark.sf0001)
      .filter(col("status") === "kept").count()
    assert(f(3L)._2 == p1Kept, "near_dedup stage must equal p1's kept count")
    assert(f(4L)._2 == p5Kept, "decontaminated stage must equal p5's kept count")
  }

  test("fixture: every stage drops, and the shared-chunk strip accounting is exact") {
    import spark.implicits._
    val chunk = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu" // 12 tokens
    val docs = Seq(
      (1L, "src1", s"$chunk and then the first story wanders off to the hills where rivers run past quiet villages in the early light"),
      (2L, "src1", s"$chunk but the second account turns toward the harbor with sailors hauling nets full of silver fish at dawn"),
      (3L, "src1", "a b c d!!!! ...,;;;; !!?? ...."),
      (4L, "src1", "the cat sat on the mat and it was happy to be in the warm sun of the morning"),
      (5L, "src1", "the cat sat on the mat and it was happy to be in the warm sun of the morning"),
      (6L, "src1", "numbers and letters mixed in a long story about the sea and the ships that sail it daily"),
      (7L, "src1", "numbers and letters mixed in a long story about the sea and the ships that sail it nightly"),
      (8L, "src1", "this entire document overlaps the held out evaluation set and must be withheld from the release"),
      (9L, "src1", "a quiet essay on gardens and the slow work of seasons turning soil into something green and alive"),
      (10L, "src1", "notes from a long walk across the city at night with lamps burning yellow over empty squares")
    ).toDF("doc_id", "source", "text")
    val cont = Seq((8L, true)).toDF("doc_id", "contaminated")
    val f = rows(P12AttritionFunnel.funnelOn(spark, docs, cont))

    assert(f(0L)._2 == 10)
    assert(f(1L)._2 == 9, "quality gate must drop exactly the junk doc")
    assert(f(2L)._2 == 8, "exact dedup must drop exactly one copy")
    assert(f(3L)._2 == 7, "near dedup must drop exactly the one-token variant")
    assert(f(4L)._2 == 6, "decontamination must drop exactly the flagged doc")
    // strip: docs 1 and 2 each lose exactly the 12 covered chunk positions
    // (their k-gram windows repeat corpus-wide only through each other;
    // the exact/near duplicates' partners are gone before strip runs).
    assert(f(5L)._2 == 6, "no doc strips to zero")
    assert(f(4L)._3 - f(5L)._3 == 24,
      s"strip must remove exactly 2x12 chunk tokens, got ${f(4L)._3 - f(5L)._3}")
    // mixture: n=6, budget=3, single source w=2, tw=2 -> quota 3
    assert(f(6L)._2 == 3, "mixture quota over the shipped set must be n/2")
    assert(f(6L)._3 < f(5L)._3)
  }
}
