package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{IndependentHash, TestSpark}

/** Pins for k8 beyond the DuckDB hash gate: (1) the weights are exactly the
  * DSIR hashed-n-gram log-ratios recomputed SERIALLY in plain Scala from
  * the raw documents (independent tokenizer + hash + snapped-ln replay —
  * the PropensitySampleSpec discipline), and (2) the weights separate the
  * target stratum from the rest — the selection property the operator
  * exists for, which a hash gate can't distinguish from noise.
  */
class DsirWeightsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val B = 256L

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  private def grams(toks: Seq[String]): Seq[String] =
    toks ++ (if (toks.size >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty)

  /** The whole k8 model replayed serially: bucket counts, snapped-ln
    * ratios, per-doc integer sums — no Spark, no SQL.
    */
  private def serialWeights(sf: String): Map[Long, (Long, Long)] = {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val occ = docs.flatMap { case (id, lang, text) =>
      grams(tokens(text)).map(g =>
        (id, lang == "en", IndependentHash.md5hash60(s"dsir:$g") % B))
    }
    val cr = occ.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val ct = occ.filter(_._2).groupBy(_._3).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val nr = occ.length.toLong
    val nt = occ.count(_._2).toLong
    def lnE9(x: Double) = math.round(math.log(x) * 1e9)
    val lr = cr.keys.map { b =>
      b -> (lnE9(ct(b) + 1.0) - lnE9(nt + B.toDouble)
        - lnE9(cr(b) + 1.0) + lnE9(nr + B.toDouble))
    }.toMap
    occ.groupBy(_._1).view.mapValues { rows =>
      (rows.length.toLong, rows.map(r => lr(r._3)).sum)
    }.toMap
  }

  test("k8 weights == serial DSIR replay, bit for bit (sf0.001)") {
    val got = K8DsirWeights.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = serialWeights(TestSpark.sf0001)
    assert(got.keySet == want.keySet,
      s"doc coverage differs: ${(got.keySet diff want.keySet).take(3)} / ${(want.keySet diff got.keySet).take(3)}")
    val diffs = want.collect { case (id, w) if got(id) != w => (id, w, got(id)) }
    assert(diffs.isEmpty, s"${diffs.size} docs differ; first: ${diffs.headOption}")
  }

  test("k8 separates the target stratum: mean log-weight en >> non-en (sf0.01)") {
    val langs = graft.Tables.documents(spark, TestSpark.sf001)
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = K8DsirWeights.run(spark, TestSpark.sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-gram mean so long docs don't dominate the stratum means
    val (en, rest) = w.partition(t => langs(t._1) == "en")
    def meanPerGram(xs: Array[(Long, Long, Long)]) =
      xs.map(t => t._3.toDouble / math.max(t._2, 1L)).sum / xs.length
    val (mEn, mRest) = (meanPerGram(en), meanPerGram(rest))
    info(f"mean per-gram log-weight (e9): en=$mEn%.0f non-en=$mRest%.0f")
    assert(en.nonEmpty && rest.nonEmpty, "vacuous fixture")
    assert(mEn > 0 && mRest < 0,
      "target docs must score positive (target-like), non-target negative")
    // measured on the driver corpus: en ≈ +3.0e6, non-en ≈ −8.1e6 per gram
    // (the synthetic langs share most vocabulary, so the gap is honest but
    // modest); floor at a quarter of the measured separation
    assert(mEn - mRest > 2.5e6,
      f"separation too weak: $mEn%.0f vs $mRest%.0f")
  }
}
