package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline: partition-batched AVI decode emits parsed geometry for every non-empty document") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val feats = Multimodal.pipeline(spark, docs).collect()
    assert(feats.length == docs.count()) // corpus has no empty docs → none dropped
    val lens = docs.selectExpr("doc_id", "CAST(octet_length(text) AS BIGINT) AS len").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.foreach { f =>
      assert(f.width == 8 && f.height == 4)
      assert(f.n_frames == math.min(16, 1 + lens(f.doc_id) / 64))
      assert(f.n_bytes > f.n_frames * 32) // container overhead beyond the rasters
      assert(f.mean_byte > 0 && f.mean_byte < 256)
    }
  }

  test("AVI decode is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = Multimodal.pipeline(spark, docs).collect().sortBy(_.doc_id)
    val b = Multimodal.pipeline(spark, docs.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling emits ceil(n_frames/stride) parsed frames per doc, deterministic") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = Multimodal.aviMedia(spark, docs)
    val stride = 2
    val frames = Multimodal.sampleFrames(media, stride).collect()
    // Per-doc frame count derives from the same parsed container pipeline() reads.
    val expected = Multimodal.pipeline(spark, docs).collect()
      .map(f => f.doc_id -> (f.n_frames + stride - 1) / stride).toMap
    val got = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    assert(got == expected)
    // Sampled indices are the stride grid; payload never visits the driver
    // in the query path (this collect is the test's, not the operator's).
    frames.foreach(f => assert(f.frame_idx % stride == 0))
    val again = Multimodal.sampleFrames(media.repartition(7), stride).collect()
    assert(frames.map(f => (f.doc_id, f.frame_idx, f.n_bytes)).sorted.toSeq ==
      again.map(f => (f.doc_id, f.frame_idx, f.n_bytes)).sorted.toSeq)
  }

  test("frame sampling drops non-AVI payloads (decode disposition, no garbage rows)") {
    import spark.implicits._
    val tiny = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, Multimodal.aviFixturePayload("a valid doc")),
      Multimodal.MediaRecord(2L, Array[Byte](7, 8, 9)),
      Multimodal.MediaRecord(3L, Array.empty[Byte])))
    val frames = Multimodal.sampleFrames(tiny, stride = 1, resize = 1).collect()
    assert(frames.map(_.doc_id).distinct.toSeq == Seq(1L))
    frames.foreach(f => assert(f.n_bytes == 32)) // resize 1: full parsed raster
  }

  test("decimate keeps every k-th byte (ceil(n/k) bytes)") {
    val bytes = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.decimate(bytes, 4).toSeq == Seq[Byte](0, 4, 8))
    assert(Multimodal.decimate(bytes, 1).toSeq == bytes.toSeq)
    assert(Multimodal.decimate(Array.empty[Byte], 3).isEmpty)
  }

  test("frame features agree with sampled frames; m3 pools the smallest-index argmax keyframe") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = Multimodal.aviMedia(spark, docs)
    // The feature path must score exactly the frames the sampling path
    // emits: same grid, same resize, score = byte-sum of the resized frame.
    val samples = Multimodal.sampleFrames(media, stride = 2, resize = 4).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f).toMap
    val feats = Multimodal.frameFeatures(media).collect()
    assert(feats.nonEmpty && feats.length == samples.size)
    feats.foreach { ff =>
      val s = samples((ff.doc_id, ff.frame_idx))
      assert(ff.n_resized == s.n_bytes)
      assert(ff.score == s.frame.map(b => (b & 0xff).toLong).sum)
    }
    // m3's struct-max argmax == independent per-doc fold: max score, ties
    // to the smallest frame index.
    val pooled = graft.queries.M3KeyframePool.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r).toMap
    feats.groupBy(_.doc_id).foreach { case (id, fs) =>
      val best = fs.minBy(f => (-f.score, f.frame_idx))
      val r = pooled(id)
      assert(r.getInt(1) == fs.length)
      assert(r.getInt(4) == best.frame_idx)
      assert(r.getLong(5) == best.score)
    }
  }

  test("REAL PPM decode: hand-built P6 image (with header comments) yields exact pixel sums") {
    // 2x2 image with known RGB values; the header exercises comments,
    // multi-whitespace, and the one-raster-separator rule of the netpbm spec.
    val header = "P6\n# a comment line\n2   2\n# another\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = Array[Int](
      255, 0, 0,   0, 255, 0,   // (red)(green)
      0, 0, 255,   10, 20, 30   // (blue)(gray-ish)
    ).map(_.toByte)
    val img = Multimodal.decodePpm(header ++ raster)
    assert(img.contains(Multimodal.PpmImage(2, 2, 255, header.length)))
    import spark.implicits._
    val feats = Multimodal.decodeImages(
      Seq(Multimodal.MediaRecord(7L, header ++ raster)).toDS()).collect()
    assert(feats.length == 1)
    val f = feats(0)
    assert((f.sum_r, f.sum_g, f.sum_b) == ((265L, 275L, 285L)))
    assert(f.n_pixels == 4 && f.width == 2 && f.height == 2)
    assert(f.mean_brightness == graft.functions.Rounding.roundTo(825.0 / 12, 6))
  }

  test("PPM decode rejects the real failure modes (disposition drop, not garbage rows)") {
    // wrong magic
    assert(Multimodal.decodePpm("P5\n2 2\n255\n".getBytes ++ Array.fill[Byte](12)(1)).isEmpty)
    // truncated raster: 2x2 needs 12 bytes, give 11
    assert(Multimodal.decodePpm("P6\n2 2\n255\n".getBytes ++ Array.fill[Byte](11)(1)).isEmpty)
    // malformed dimension
    assert(Multimodal.decodePpm("P6\nx 2\n255\n".getBytes ++ Array.fill[Byte](12)(1)).isEmpty)
    // zero dimension
    assert(Multimodal.decodePpm("P6\n0 2\n255\n".getBytes ++ Array.fill[Byte](12)(1)).isEmpty)
    // empty / garbage payload (the fixture's empty-text disposition)
    assert(Multimodal.decodePpm(Array[Byte]('X')).isEmpty)
    assert(Multimodal.decodePpm(Multimodal.ppmFixturePayload("")).isEmpty)
    // a decode stage over a mixed batch drops exactly the invalid rows
    import spark.implicits._
    val ok = Multimodal.ppmFixturePayload("hello world")
    val rows = Multimodal.decodeImages(Seq(
      Multimodal.MediaRecord(1L, ok),
      Multimodal.MediaRecord(2L, Array[Byte]('X')),
      Multimodal.MediaRecord(3L, ok.dropRight(1))).toDS()).collect()
    assert(rows.map(_.doc_id).toSeq == Seq(1L))
  }

  test("fixture payloads are REAL spec-valid PPMs the decoder round-trips") {
    val p = Multimodal.ppmFixturePayload("some document text")
    val img = Multimodal.decodePpm(p)
    assert(img.isDefined)
    val i = img.get
    assert(i.width == 8 && i.maxval == 255)
    assert(p.length - i.dataOffset == i.width * i.height * 3)
  }

  test("AVI container size follows the fixture framing exactly (header overhead + 40B/frame)") {
    // RIFF(12) + LIST hdrl(8+1216) + JUNK(8+8) + LIST movi hdr(8+4) = 1264,
    // then each 00db frame chunk is 8 + 32 bytes.
    val feats = Multimodal.pipeline(spark, Tables.documents(spark, TestSpark.sf0001)).collect()
    feats.foreach(f => assert(f.n_bytes == 1264 + 40 * f.n_frames))
  }

  test("REAL AVI decode: hand-built container parses to exact geometry and raster bytes") {
    val text = "x" * 100 // 100 bytes -> min(16, 1 + 100/64) = 2 frames
    val p = Multimodal.aviFixturePayload(text)
    val v = Multimodal.decodeAvi(p)
    assert(v.isDefined)
    val a = v.get
    assert(a.width == 8 && a.height == 4 && a.nFrames == 2 && a.frameSize == 32)
    // decoded rasters are the text bytes repeated cyclically
    val tb = text.getBytes("UTF-8")
    for (f <- 0 until a.nFrames; j <- 0 until 32)
      assert(p(a.frameOffsets(f) + j) == tb((f * 32 + j) % tb.length))
    // extractFeatures folds the mean from the PARSED rasters
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Seq(Multimodal.MediaRecord(5L, p)).toDS()).collect()
    assert(feats.length == 1)
    val expMean = (0 until 64).map(i => tb(i % tb.length) & 0xff).sum / 64.0
    assert(feats(0).mean_byte == expMean && feats(0).n_frames == 2)
  }

  test("AVI decode rejects the real failure modes (disposition drop, not garbage rows)") {
    def avi(mutate: Array[Byte] => Unit = _ => ()): Array[Byte] = {
      val p = Multimodal.aviFixturePayload("hello multimodal world " * 5)
      mutate(p); p
    }
    def at(p: Array[Byte], tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      p.indexOfSlice(t)
    }
    assert(Multimodal.decodeAvi(avi()).isDefined)
    // wrong container magic
    assert(Multimodal.decodeAvi(avi(p => p(0) = 'X')).isEmpty)
    // wrong form type (AVI  -> AVX )
    assert(Multimodal.decodeAvi(avi(p => p(10) = 'X')).isEmpty)
    // stream is not video: strh fccType vids -> xids
    assert(Multimodal.decodeAvi(avi(p => p(at(p, "vids")) = 'x')).isEmpty)
    // compressed BITMAPINFOHEADER (biCompression != 0 at strf body + 16)
    assert(Multimodal.decodeAvi(avi(p => p(at(p, "strf") + 8 + 16) = 1)).isEmpty)
    // wrong bit depth (biBitCount at strf body + 14): 8 -> 24
    assert(Multimodal.decodeAvi(avi(p => p(at(p, "strf") + 8 + 14) = 24)).isEmpty)
    // frame-count lie (avih dwTotalFrames at avih body + 16)
    assert(Multimodal.decodeAvi(avi(p => p(at(p, "avih") + 8 + 16) = 99)).isEmpty)
    // header/strf dimension mismatch (avih dwWidth at body + 32): 8 -> 9
    assert(Multimodal.decodeAvi(avi(p => p(at(p, "avih") + 8 + 32) = 9)).isEmpty)
    // truncated movi: last frame chunk overruns the payload
    assert(Multimodal.decodeAvi(avi().dropRight(1)).isEmpty)
    // garbage / empty-text fixture
    assert(Multimodal.decodeAvi(Array[Byte]('X')).isEmpty)
    assert(Multimodal.decodeAvi(Multimodal.aviFixturePayload("")).isEmpty)
    // a decode stage over a mixed batch drops exactly the invalid rows
    import spark.implicits._
    val rows = Multimodal.extractFeatures(Seq(
      Multimodal.MediaRecord(1L, avi()),
      Multimodal.MediaRecord(2L, Array[Byte]('X')),
      Multimodal.MediaRecord(3L, avi().dropRight(1))).toDS()).collect()
    assert(rows.map(_.doc_id).toSeq == Seq(1L))
  }

  test("AVI fixture is spec-valid: odd JUNK chunk pad-skipped, 8bpp palette present") {
    val p = Multimodal.aviFixturePayload("abc")
    // the odd-sized JUNK chunk sits between hdrl and movi; the walker must
    // skip it with the pad rule or the movi list is never reached
    assert(p.indexOfSlice("JUNK".getBytes("US-ASCII")) > 0)
    assert(p.indexOfSlice("fixture".getBytes("US-ASCII")) > 0)
    val v = Multimodal.decodeAvi(p)
    assert(v.isDefined && v.get.nFrames == 1)
    // strf carries BITMAPINFOHEADER + full 256-entry palette
    val strf = p.indexOfSlice("strf".getBytes("US-ASCII"))
    val sz = (p(strf + 4) & 0xff) | ((p(strf + 5) & 0xff) << 8) |
      ((p(strf + 6) & 0xff) << 16) | ((p(strf + 7) & 0xff) << 24)
    assert(sz == 40 + 256 * 4)
  }

  test("REAL WAV decode: hand-built RIFF file (negative samples, junk chunk) parses exactly") {
    // samples: -1, 300, -32768, 7 — signedness and LE byte order both bite
    // if the int16 reassembly is wrong.
    val samples = Seq(-1, 300, -32768, 7)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    tag("RIFF"); w32(4 + 24 + 8 + samples.size * 2); tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(1); w32(44100); w32(88200); w16(2); w16(16)
    tag("data"); w32(samples.size * 2); samples.foreach(w16)
    val a = Multimodal.decodeWav(out.toByteArray)
    assert(a.contains(Multimodal.WavAudio(44100, 44, samples.size)))
    // and the decoded fold over a MediaRecord matches hand arithmetic
    import spark.implicits._
    val f = Multimodal.decodeAudio(
      Seq(Multimodal.MediaRecord(9L, out.toByteArray)).toDS()).collect()(0)
    assert(f.n_samples == 4 && f.sum_samples == samples.map(_.toLong).sum)
    assert(f.max_amp == 32768 && f.sample_rate == 44100)
  }

  test("WAV decode rejects the real failure modes (disposition drop, not garbage rows)") {
    def wav(mutate: Array[Byte] => Unit = _ => ()): Array[Byte] = {
      val p = Multimodal.wavFixturePayload("hello world")
      mutate(p); p
    }
    assert(Multimodal.decodeWav(wav()).isDefined)
    // wrong container magic
    assert(Multimodal.decodeWav(wav(p => p(0) = 'X')).isEmpty)
    // wrong form type (WAVE -> WAVX)
    assert(Multimodal.decodeWav(wav(p => p(11) = 'X')).isEmpty)
    // non-PCM format code (fmt code byte at offset 20)
    assert(Multimodal.decodeWav(wav(p => p(20) = 2)).isEmpty)
    // chunk size overrunning the payload must be rejected, not chased
    assert(Multimodal.decodeWav(wav(p => p(4) = -1)).isDefined) // RIFF size unused: still fine
    val truncated = wav().dropRight(3)
    assert(Multimodal.decodeWav(truncated).isEmpty)
    assert(Multimodal.decodeWav(Array[Byte]('X')).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.wavFixturePayload("")).isEmpty)
  }

  test("WAV fixture payloads are spec-valid and the junk LIST chunk is skipped") {
    val p = Multimodal.wavFixturePayload("abc")
    val a = Multimodal.decodeWav(p)
    assert(a.isDefined && a.get.nSamples == 3 && a.get.sampleRate == 8000)
    import spark.implicits._
    val f = Multimodal.decodeAudio(Seq(Multimodal.MediaRecord(1L, p)).toDS()).collect()(0)
    assert(f.sum_samples == "abc".map(_.toLong).sum && f.max_amp == 'c'.toInt)
  }
}
