package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** d18/p7 — exact-substring dedup semantics (Lee et al. 2022 ExactSubstr):
  *
  *   1. the HEADLINE capability claim: a verbatim ≥ k-token chunk shared by
  *      two otherwise-different long documents is INVISIBLE to both d4
  *      (set Jaccard) and d17 (containment) yet d18 recovers its exact
  *      token bounds in both copies — the published reason ExactSubstr
  *      exists alongside set-similarity dedup;
  *   2. paper semantics details: self-repeats (one doc containing the same
  *      sentence twice) count as duplication; maximal-run recovery gives
  *      exact span bounds;
  *   3. p7 strips exactly the covered positions and nothing else;
  *   4. real-corpus structural invariants tying d18 and p7 together.
  */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val k = ExactSubstr.k // 10

  private def sweep(): Unit =
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

  // 14-token verbatim chunk shared by docs 1 and 2; all filler tokens are
  // globally unique so the chunk's grams are the ONLY duplicated k-grams.
  private val chunk = ("alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima mike november").split(" ").toSeq
  private val sentence = ("oscar papa quebec romeo sierra tango uniform " +
    "victor whiskey xray").split(" ").toSeq // 10 tokens, repeated in doc 3

  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d18fix").toString
    def filler(doc: Int, n: Int, off: Int = 0): Seq[String] =
      (0 until n).map(i => f"fd${doc}x${i + off}%04d")
    val docs = Seq(
      // doc 1: 20 filler + chunk + 20 filler -> span at tokens 21..34
      (1L, (filler(1, 20) ++ chunk ++ filler(1, 20, 100)).mkString(" ")),
      // doc 2: chunk first, then 40 filler -> span at tokens 1..14
      (2L, (chunk ++ filler(2, 40)).mkString(" ")),
      // doc 3: sentence + 1 separator + sentence -> self-repeat, two spans
      (3L, (sentence ++ Seq("zzsep") ++ sentence).mkString(" ")),
      // doc 4: pure filler, no duplication anywhere
      (4L, filler(4, 45).mkString(" ")))
      .map { case (id, text) => (id, text, "en", "fixture", text.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("the shared chunk is invisible to d4 (Jaccard) and d17 (containment)") {
    val d4 = D4NgramJaccard.run(spark, fixtureDir).collect()
    sweep()
    assert(!d4.exists(r => Set(r.getLong(0), r.getLong(1)) == Set(1L, 2L)),
      s"d4 flagged the (1,2) pair: ${d4.mkString("; ")}")
    val d17 = D17Containment.run(spark, fixtureDir).collect()
    sweep()
    assert(!d17.exists(r => Set(r.getLong(0), r.getLong(1)) == Set(1L, 2L)),
      s"d17 flagged the (1,2) pair: ${d17.mkString("; ")}")
  }

  test("d18 recovers the chunk's exact token bounds in both documents") {
    val spans = D18ExactSubstr.run(spark, fixtureDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    sweep()
    val byDoc = spans.groupBy(_._1)
    // doc 1: exactly one span, tokens 21..34 (14 tokens, 5 grams, occ 2)
    assert(byDoc(1L).toSeq == Seq((1L, 21L, 34L, 14L, 5L, 2L)))
    // doc 2: the same chunk at tokens 1..14
    assert(byDoc(2L).toSeq == Seq((2L, 1L, 14L, 14L, 5L, 2L)))
    // doc 3: the self-repeat yields TWO spans (positions 1..10 and 12..21)
    // — occurrence counting is corpus-wide INCLUDING same-doc repeats
    assert(byDoc(3L).toSeq == Seq((3L, 1L, 10L, 10L, 1L, 2L), (3L, 12L, 21L, 10L, 1L, 2L)))
    // doc 4: clean
    assert(!byDoc.contains(4L))
  }

  test("p7 strips exactly the covered spans and nothing else") {
    val rows = P7SpanStrip.run(spark, fixtureDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    sweep()
    val (n1, d1, t1) = rows(1L)
    assert((n1, d1) == (54L, 14L))
    assert(!chunk.exists(t1.split(" ").contains), "chunk tokens survived in doc 1")
    assert(t1.split(" ").length == 40)
    val (n2, d2, t2) = rows(2L)
    assert((n2, d2) == (54L, 14L) && t2.split(" ").length == 40)
    // doc 3: both copies of the sentence are removed; only the separator stays
    assert(rows(3L) == ((21L, 20L, "zzsep")))
    // doc 4 untouched, text intact
    assert(rows(4L)._2 == 0L && rows(4L)._3.split(" ").length == 45)
  }

  test("real-corpus invariants: span arithmetic, and p7 coverage == d18 span union") {
    val spans = D18ExactSubstr.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    sweep()
    assert(spans.nonEmpty, "sf0.001 corpus has no verbatim repeats?")
    spans.foreach { case (doc, s, e, n, g) =>
      assert(n == e - s + 1, s"doc $doc span [$s,$e] length mismatch")
      assert(n >= k && g == n - k + 1, s"doc $doc gram-count arithmetic broken")
    }
    // maximality: runs within one doc are separated by > 1 position gaps
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _, _), (_, s2, _, _, _)) =>
          assert(s2 > e1 + 1, "adjacent runs should have merged")
        case _ => ()
      }
    }
    val cover = spans.groupBy(_._1).map { case (doc, ss) =>
      doc -> ss.flatMap { case (_, s, e, _, _) => s to e }.toSet.size.toLong
    }
    val p7 = P7SpanStrip.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    sweep()
    p7.foreach { case (doc, nTok, nDrop, clean) =>
      assert(nDrop == cover.getOrElse(doc, 0L), s"doc $doc: p7 dropped $nDrop, d18 covers ${cover.get(doc)}")
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept == nTok - nDrop, s"doc $doc: clean token count $kept != $nTok - $nDrop")
    }
  }
}
