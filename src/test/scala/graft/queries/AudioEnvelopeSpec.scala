package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal

/** m8's fingerprint beyond the replay oracle — the PERCEPTUAL claims over
  * hand-built spec-valid WAVs with CHOSEN samples (the text fixture can
  * only produce 0..255 sample values, so these payloads are where the
  * general int16 paths — negative samples, rectification, clamping — get
  * exercised):
  *
  *  - robustness: a sub-quantizer perturbation leaves the envelope hash
  *    IDENTICAL (why perceptual beats exact md5 for near-dup audio);
  *  - rectification: a phase-inverted clip (every sample negated) has the
  *    SAME amplitude envelope — loudness shape, not waveform sign;
  *  - discrimination: swapping the loud and quiet halves flips the hash;
  *  - disposition: invalid containers and clips shorter than the window
  *    count are dropped, never fingerprinted;
  *  - serial parity: the operator's hash equals a plain-Scala recompute
  *    from the sample list (independent of decoder offsets).
  */
class AudioEnvelopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Spec-valid mono 16-bit PCM WAV around arbitrary signed samples —
    * wavFixturePayload's container layout (including the odd-size junk
    * chunk) with the sample stream under the test's control.
    */
  private def wav(samples: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    val dataSize = samples.length * 2
    val junk = "fixture".getBytes
    tag("RIFF"); w32(4 + (8 + 16) + (8 + junk.length + 1) + (8 + dataSize)); tag("WAVE")
    tag("fmt "); w32(16)
    w16(1); w16(1); w32(8000); w32(16000L); w16(2); w16(16)
    tag("LIST"); w32(junk.length); out.write(junk); out.write(0)
    tag("data"); w32(dataSize)
    samples.foreach(w16)
    out.toByteArray
  }

  private def serialEnvelope(samples: Seq[Int], windows: Int = 8): Long = {
    val n = samples.length
    (0 until windows).foldLeft(0L) { (fp, w) =>
      val (start, end) = ((w * n / windows), ((w + 1) * n / windows))
      val slice = samples.slice(start, end)
      fp * 4 + math.min(3L, (slice.map(s => math.abs(s).toLong).sum / slice.size) / 64)
    }
  }

  private def envelopes(recs: Seq[Multimodal.MediaRecord]): Map[Long, Long] = {
    import spark.implicits._
    Multimodal.audioEnvelopes(recs.toDS())
      .collect().map(e => e.doc_id -> e.env_hash).toMap
  }

  test("robustness, rectification, discrimination, disposition, serial parity") {
    val loud = Seq.fill(8)(20000); val quiet = Seq.fill(8)(10)
    val base = loud ++ quiet
    val nudged = loud.map(_ + 5) ++ quiet.map(_ + 5) // sub-quantizer everywhere
    val negated = base.map(-_)                        // phase inversion
    val swapped = quiet ++ loud                       // different loudness shape
    val out = envelopes(Seq(
      Multimodal.MediaRecord(1L, wav(base)),
      Multimodal.MediaRecord(2L, wav(nudged)),
      Multimodal.MediaRecord(3L, wav(negated)),
      Multimodal.MediaRecord(4L, wav(swapped)),
      Multimodal.MediaRecord(5L, Array[Byte]('X', 'Y')), // not a RIFF
      Multimodal.MediaRecord(6L, wav(Seq(1, 2, 3)))))    // shorter than 8 windows
    assert(out.keySet == Set(1L, 2L, 3L, 4L),
      "invalid payload and too-short clip must be dropped, valid ones kept")
    assert(out(1L) == out(2L), "sub-quantizer perturbation must not move the hash")
    assert(out(1L) == out(3L), "phase inversion must not move the amplitude envelope")
    assert(out(1L) != out(4L), "swapping loud/quiet halves must move the hash")
    assert(out(1L) == serialEnvelope(base), "operator hash != serial recompute")
    assert(out(4L) == serialEnvelope(swapped))
    // loud halves quantize to 3, quiet to 0: base = 33330000 in base 4
    assert(out(1L) == java.lang.Long.parseLong("33330000", 4))
  }

  test("identical envelopes collapse onto the min-id survivor in the query shape (sf0.001)") {
    val rows = M8AudioEnvelope.run(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    val byHash = rows.groupBy(_.getLong(1))
    byHash.foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(0))
      assert(rs.forall(_.getLong(2) == ids.min), "survivor must be the min doc_id")
      assert(rs.forall(_.getLong(3) == ids.length.toLong), "n_same must be the group size")
    }
    // the 2-bit × 8-window space over one corpus actually collapses
    // something: real dup mass, not a vacuous all-distinct pass
    assert(byHash.exists(_._2.length > 1), "expected at least one envelope collision")
  }
}
