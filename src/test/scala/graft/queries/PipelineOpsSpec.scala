package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic pins for the round-3 pipeline operators (d8/t8/t9/s5) beyond
  * the DuckDB hash gate: Bloom's no-false-negative guarantee, plain-Scala
  * reimplementations of the repetition and LM scores (independent of every
  * Catalyst expression the queries use), and the quantized-ANN recall floor.
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docTexts(): Map[Long, String] =
    graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def normalize(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim

  test("d8: probe matches an independent Bloom reimplementation (⟹ zero false negatives)") {
    // Independent arithmetic from the SPEC in D8BloomDedup's scaladoc — md5
    // via MessageDigest ([[graft.IndependentHash]]), 12-bit slices at
    // offsets 0/20/40 — not from the query's Column code. Functional
    // equivalence to this model implies the no-false-negative guarantee (a
    // member's bits are all set by construction), which this fixture cannot
    // witness directly: the corpus has near-duplicates but no EXACT
    // cross-parity duplicates, so every probe's ground truth here is
    // "fresh".
    import graft.IndependentHash.md5hash60
    def positions(text: String): Seq[Long] = {
      val h = md5hash60(normalize(text))
      Seq(0, 20, 40).map(o => (h >> o) & 4095L)
    }
    val texts = docTexts()
    val refBits = texts.collect { case (id, t) if id % 2 == 0 => positions(t) }
      .flatten.toSet
    val expected = texts.collect { case (id, t) if id % 2 == 1 =>
      id -> positions(t).forall(refBits)
    }
    val got = D8BloomDedup.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.keySet == expected.keySet)
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: query says ${got(id)}, independent Bloom says $exp")
    // All probes are fresh here, so every hit is a false positive.
    val fpRate = got.values.count(identity).toDouble / got.size
    info(f"bloom false-positive rate at sf0.001: $fpRate%.4f over ${got.size} fresh docs")
    // ~125 ref docs × 3 bits in 4096 → ~9% fill → FP ≈ 0.09³ ≈ 1e-3.
    assert(fpRate <= 0.10, f"false-positive rate $fpRate%.3f implausibly high")
  }

  test("t8: fractions match a plain-Scala reimplementation") {
    val texts = docTexts()
    val got = T8Repetition.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.size == texts.size)
    for ((id, text) <- texts) {
      val toks = tokenize(text)
      val (nTok, dwf, tbf) = got(id)
      assert(nTok == toks.size, s"doc $id token count")
      val expDwf = if (toks.isEmpty) 0.0 else 1.0 - toks.distinct.size.toDouble / toks.size
      assert(math.abs(dwf - expDwf) < 1e-6, s"doc $id dup_word_frac: $dwf vs $expDwf")
      val bgs = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      val expTbf =
        if (bgs.isEmpty) 0.0
        else bgs.groupBy(identity).values.map(_.size).max.toDouble / bgs.size
      assert(math.abs(tbf - expTbf) < 1e-6, s"doc $id top_bigram_frac: $tbf vs $expTbf")
    }
  }

  test("t9: avg log-prob matches a plain-Scala bigram LM") {
    val texts = docTexts()
    val allToks = texts.view.mapValues(tokenize).toMap
    val uniCounts = allToks.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val bigramCounts = allToks.values
      .flatMap(_.sliding(2).filter(_.size == 2).map(b => (b(0), b(1))))
      .groupBy(identity).view.mapValues(_.size).toMap
    val v = uniCounts.size
    val got = T9BigramLm.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val scoreable = allToks.filter(_._2.size >= 2)
    assert(got.keySet == scoreable.keySet, "exactly the docs with >= 2 tokens are scored")
    for ((id, toks) <- scoreable) {
      val bgs = toks.sliding(2).filter(_.size == 2).map(b => (b(0), b(1))).toSeq
      val exp = bgs.map { case (w1, w2) =>
        math.log((bigramCounts((w1, w2)) + 1.0) / (uniCounts(w1) + v))
      }.sum / bgs.size
      val (nBg, avgLogp) = got(id)
      assert(nBg == bgs.size, s"doc $id bigram count")
      assert(math.abs(avgLogp - exp) < 1e-4, s"doc $id avg_logp: $avgLogp vs $exp")
      assert(avgLogp < 0.0, "log-probabilities are negative")
    }
  }

  test("d9: cross-parity near-duplicates are always flagged contaminated") {
    // Theorem: for a verified pair (a, b) with shingle-Jaccard J > 0.5 where
    // a is in the reference half and b in the probe half,
    // overlap_frac(b) ≥ |a∩b|/|b| ≥ |a∩b|/|a∪b| = J > 0.5 = the flag
    // threshold — so d9 must flag b, whatever else the reference contains.
    // Strict >: d4's jaccard column is ROUNDED to 6 decimals, so a pair
    // displaying exactly 0.500000 could have true J = 0.4999996 and
    // legitimately fall below the unrounded flag threshold; rounded > 0.5
    // implies true J ≥ 0.5000005 > 0.5, which keeps the bound airtight.
    import org.apache.spark.sql.functions.col
    val pairs = D4NgramJaccard.run(spark, TestSpark.sf0001)
      .filter(col("jaccard") > 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val crossParity = pairs.collect {
      case (a, b) if a % 2 == 0 && b % 2 == 1 => b
      case (a, b) if a % 2 == 1 && b % 2 == 0 => a
    }.toSet
    assert(crossParity.nonEmpty, "fixture should contain cross-parity near-dups")
    val flagged = D9Contamination.run(spark, TestSpark.sf0001)
      .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
    val missed = crossParity -- flagged
    assert(missed.isEmpty,
      s"near-duplicates of reference docs not flagged contaminated: $missed")
    info(s"${crossParity.size} cross-parity near-dups, ${flagged.size} flagged total")
  }

  test("d9: a probe doc too short to shingle is reported, not omitted") {
    // The test corpus has no <3-token documents, so the oracle never
    // exercises this branch — pin it on a crafted fixture: the short doc
    // must appear with n_shingles = 0 and NULL score/flag ("unscorable"),
    // never be silently dropped.
    import spark.implicits._
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "src0", 30L), // reference
      (1L, "alpha beta gamma delta epsilon", "en", "src0", 30L), // contaminated probe
      (3L, "tiny doc", "en", "src0", 8L)) // probe, 2 tokens -> no shingles
    val dir = java.nio.file.Files.createTempDirectory("d9_fixture").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = D9Contamination.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 3L), s"probe docs missing: ${got.keySet}")
    assert(got(1L).getBoolean(4), "identical probe doc must be contaminated")
    val short = got(3L)
    assert(short.getLong(1) == 0L && short.isNullAt(3) && short.isNullAt(4),
      s"short doc must be (0 shingles, NULL score, NULL flag), got $short")
  }

  test("s5: quantized top-10 keeps high recall against the exact ranking") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(S1AnnBrute.run(spark, TestSpark.sf0001))
    val quant = pairs(S5AnnQuantized.run(spark, TestSpark.sf0001))
    assert(exact.nonEmpty)
    val recall = (exact intersect quant).size.toDouble / exact.size
    info(f"s5 recall vs s1 at sf0.001: $recall%.3f")
    // int8 max-abs quantization perturbs cosines by ~1e-2 relative — far
    // tighter than the bucketed ANN paths; the floor reflects that. NOTE:
    // s5 ranks by dequantized DOT PRODUCT while s1 ranks by COSINE, so the
    // gap measures quantization + normalization together.
    assert(recall >= 0.60, f"s5 recall $recall%.3f fell below the 0.60 floor")
  }

  test("d12: histogram conserves pair mass and brackets d5's threshold count") {
    val hist = D12CosineHistogram.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = graft.Tables.embeddings(spark, TestSpark.sf0001).count()
    assert(hist.values.sum == n * (n - 1) / 2,
      s"histogram lost pairs: ${hist.values.sum} != ${n * (n - 1) / 2}")
    // d5 keeps pairs with round(cos,6) >= 0.35. Bucket = floor(round*20):
    // 0.35·20 is 6.9999… in IEEE doubles, so an exactly-0.35 pair lands in
    // bucket 6 — the d5 count is bracketed by buckets ≥7 and ≥6.
    val d5 = D5EmbedDedup.run(spark, TestSpark.sf0001).count()
    val ge7 = hist.collect { case (b, c) if b >= 7 => c }.sum
    val ge6 = hist.collect { case (b, c) if b >= 6 => c }.sum
    assert(ge7 <= d5 && d5 <= ge6,
      s"d5 count $d5 outside histogram bracket [$ge7, $ge6]")
  }

  test("p5: differs from p1 only by kept->eval_overlap; every hit is an odd contaminated doc") {
    import org.apache.spark.sql.functions._
    val p1 = P1CleanCorpus.run(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("status"), col("survivor")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    val p5 = P5Decontaminated.run(spark, TestSpark.sf0001).collect()
    assert(p5.length == p1.size)
    val contaminated = D9Contamination.run(spark, TestSpark.sf0001)
      .filter(col("contaminated") === true).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    var hits = 0
    p5.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val st = r.getString(r.fieldIndex("status"))
      val (p1st, p1surv) = p1(id)
      if (st == "eval_overlap") {
        hits += 1
        assert(p1st == "kept", s"doc $id re-dispositioned from non-kept status $p1st")
        assert(id % 2 == 1 && contaminated(id), s"doc $id flagged without d9 evidence")
        assert(r.isNullAt(r.fieldIndex("survivor")), s"eval_overlap doc $id kept a survivor")
      } else {
        assert(st == p1st, s"doc $id status drifted: $p1st -> $st")
        val surv = if (r.isNullAt(r.fieldIndex("survivor"))) None else Some(r.getLong(r.fieldIndex("survivor")))
        assert(surv == p1surv, s"doc $id survivor drifted")
        assert(!(p1st == "kept" && contaminated(id)), s"contaminated kept doc $id not flagged")
      }
    }
    info(s"p5 eval_overlap hits at sf0.001: $hits")
    assert(hits > 0, "eval_overlap branch is vacuous on the test corpus")
  }

  test("k3: top-component loadings are unit-norm; eigenvalue dominates the init direction") {
    val rows = K3PcaPower.run(spark, TestSpark.sf0001).collect()
    assert(rows.length == 64)
    val v = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    val eig = rows.head.getDouble(2)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"loadings norm $norm drifted from 1")
    assert(eig > 0.0, s"eigenvalue estimate $eig not positive")
    // Rayleigh quotient of the returned v must be >= that of the uniform
    // init direction (power iteration ascends on a PSD Gram matrix).
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def rayleigh(dir: Array[Double]): Double = {
      val n = math.sqrt(dir.map(x => x * x).sum)
      e.map { x => val u = x.zip(dir).map { case (a, b) => a * b }.sum / n; u * u }.sum / e.length
    }
    val init = Array.fill(64)(0.125)
    assert(rayleigh(v) >= rayleigh(init) - 1e-9,
      s"returned direction has lower Rayleigh quotient than the init")
  }
}
