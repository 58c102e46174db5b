package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{IndependentHash, TestSpark}

/** Pins for s12 beyond the DuckDB hash gate: (1) the selection is exactly
  * the Efraimidis–Spirakis top-n recomputed serially in plain Scala from
  * k4's published scores (independent of the query's Column expressions),
  * and (2) the sample actually tilts toward quality — the property the
  * operator exists for, which a hash gate can't distinguish from uniform
  * sampling.
  */
class PropensitySampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val uGrid = 1048576L

  private def serialTop(sf: String, n: Int): Seq[(Long, Double, Long)] = {
    val scored = K4QualityClassifier.run(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    scored.map { case (id, score) =>
      val hmod = IndependentHash.md5hash60(s"es:$id") % uGrid
      val negLnU = math.round(-math.log((hmod + 1).toDouble / uGrid.toDouble) * 1e6)
      val key = math.round(negLnU.toDouble / math.max(score, 1e-6))
      (id, score, key)
    }.sortBy { case (id, _, key) => (key, id) }.take(n).toSeq
  }

  test("s12 selection == serial Efraimidis-Spirakis replay (sf0.001)") {
    val got = S12PropensitySample.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val want = serialTop(TestSpark.sf0001, got.size)
    assert(got == want)
  }

  test("s12 tilts toward weight: 9:1 bimodal fixture selects mostly heavy docs") {
    // The driver corpus' k4 scores span only 0.281–0.304 — a ~1.08:1 weight
    // ratio whose A-ES tilt is statistically invisible at n=200 — so the
    // bias property pins on a synthetic frame where it must be blatant:
    // 500 docs at weight 0.9 vs 500 at 0.1. With w_h/w_l = 9, a light doc
    // outranks a heavy one only on a large ln-u gap (P ≈ w_l/(w_l+w_h) per
    // pair), so the 200 winners should be overwhelmingly heavy. The
    // selection is deterministic (hash-derived u), so this asserts a fixed
    // measured count, not a probabilistic bound.
    import spark.implicits._
    val scored = (0L until 1000L)
      .map(id => (id, if (id % 2 == 0) 0.9 else 0.1)).toDF("doc_id", "score")
    val sel = S12PropensitySample.sampleOn(scored, 200).collect()
    val heavy = sel.count(_.getDouble(1) == 0.9)
    info(s"heavy-weight docs among 200 selected: $heavy")
    assert(sel.length == 200)
    assert(heavy >= 170,
      s"9:1 weights should dominate the A-ES sample: only $heavy/200 heavy")
    // and the unweighted (w≡1) selection over the same frame differs: the
    // weights, not the hash, drive the membership above
    val uniform = S12PropensitySample.sampleOn(
      scored.withColumn("score", org.apache.spark.sql.functions.lit(1.0)), 200)
      .collect().map(_.getLong(0)).toSet
    assert(sel.map(_.getLong(0)).toSet != uniform)
  }

  test("s12 zero-weight clamp: score 0.0 never divides by zero and ranks last") {
    import spark.implicits._
    // 10 zero-weight docs against 10 weight-1.0 docs: the 1e-6 clamp must
    // (a) produce finite keys — an unclamped 0 divisor would throw or yield
    // a NULL/Infinity row the hash gate can't see consistently — and
    // (b) push every zero-weight doc behind every weighted doc (keys ~1e6×
    // larger), so a zero-scored doc is selected only when the budget
    // exceeds the weighted population.
    val scored = (0L until 20L)
      .map(id => (id, if (id < 10L) 0.0 else 1.0)).toDF("doc_id", "score")
    val all = S12PropensitySample.sampleOn(scored, 20).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(all.length == 20 && all.forall(_._3 >= 0L), "non-finite or missing keys")
    val (zeros, ones) = all.partition(_._2 == 0.0)
    assert(zeros.map(_._3).min > ones.map(_._3).max,
      "a zero-weight doc outranked a weighted doc")
    val first10 = S12PropensitySample.sampleOn(scored, 10).collect().map(_.getLong(0)).toSet
    assert(first10 == (10L until 20L).toSet,
      "budget <= weighted population must select no zero-weight doc")
  }
}
