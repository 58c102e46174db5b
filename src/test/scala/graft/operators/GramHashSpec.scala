package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Round-15 optimization pin: the native rolling
  * [[org.apache.spark.sql.graft.GramHash]] expression must be BIT-IDENTICAL
  * to the slice-fold combinator form it replaced ([[TextOps.gramHashesComposed]])
  * — same hash values at every position, same empty-array contract for
  * short/null inputs — so the whole d18/t28/p7/winnowing chain is unchanged
  * by construction.
  */
class GramHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rolling expression equals the slice-fold form over the corpus (k=10 and k=4)") {
    for (k <- Seq(4, 10)) {
      val ht = TextOps.tokenHashes(TextOps.tokens(col("text")))
      val bad = Tables.documents(spark, TestSpark.sf001)
        .select(
          TextOps.gramHashes(ht, k).as("native"),
          TextOps.gramHashesComposed(ht, k).as("composed"))
        .filter(not(col("native") <=> col("composed")))
        .count()
      assert(bad == 0L, s"gram hash drift at k=$k")
    }
  }

  test("short and null inputs yield the empty array, matching the composed contract") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq(1L, 2L, 3L))),   // shorter than k
      (2L, Some(Seq.empty[Long])),   // empty
      (3L, None)                     // null array
    ).toDF("id", "ht")
    val rows = df.select(
      TextOps.gramHashes(col("ht"), 4).as("native"),
      TextOps.gramHashesComposed(col("ht"), 4).as("composed")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(0), "native must be empty, not null")
      assert(r.getSeq[Long](0).isEmpty)
      // composed contract is also empty-not-null for these inputs
      assert(!r.isNullAt(1) && r.getSeq[Long](1).isEmpty)
    }
  }

  test("exact window boundary: len == k produces exactly one hash, equal in both forms") {
    import spark.implicits._
    val df = Seq((1L, Seq(7L, 11L, 13L, 17L))).toDF("id", "ht")
    val r = df.select(
      TextOps.gramHashes(col("ht"), 4).as("native"),
      TextOps.gramHashesComposed(col("ht"), 4).as("composed")).head
    assert(r.getSeq[Long](0).length == 1)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }

  test("raw 60-bit tokens (>= 2^32) hash identically to the composed fold") {
    // Round-16 ADVICE fix: without the mod-P load reduction, the rolling
    // subtract's (tOut · A^{k−1}) overflowed Long for tokens >= ~2^32 and
    // silently diverged from the composed fold (whose intermediates stay
    // < 2^63 for ~60-bit tokens). Equality must now hold on the raw-hash60
    // domain, not just pre-reduced < 2^31 inputs.
    import spark.implicits._
    val big = Seq(
      (1L << 32) + 7L, (1L << 59) - 1L, (1L << 45) + 12345L, 0L,
      (1L << 33) + 1L, TextOps.TokenPrime, TextOps.TokenPrime + 1L,
      (1L << 58) + 99L, 17L, (1L << 40))
    val df = Seq((1L, big)).toDF("id", "ht")
    for (k <- Seq(2, 4, 7)) {
      val r = df.select(
        TextOps.gramHashes(col("ht"), k).as("native"),
        TextOps.gramHashesComposed(col("ht"), k).as("composed")).head
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"drift at k=$k on 60-bit tokens")
    }
  }

  test("hostile values near the modulus roll without overflow divergence") {
    import spark.implicits._
    val p = TextOps.TokenPrime
    val arr = Seq(p - 1, p - 2, 0L, 1L, p - 1, p - 3, 2L, p - 1, 5L, p - 2, p - 1, 3L)
    val df = Seq((1L, arr)).toDF("id", "ht")
    for (k <- Seq(2, 5, 10)) {
      val r = df.select(
        TextOps.gramHashes(col("ht"), k).as("native"),
        TextOps.gramHashesComposed(col("ht"), k).as("composed")).head
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"drift at k=$k")
    }
  }
}
