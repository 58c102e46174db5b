package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline: partition-batched decode emits typed features for every document") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val feats = Multimodal.pipeline(spark, docs).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 16 && f.width < 16 + 1024)
      assert(f.height >= 16 && f.height < 16 + 1024)
      assert(f.n_frames >= 1 && f.n_frames <= 16)
      assert(f.mean_byte > 0 && f.mean_byte < 256)
    }
  }

  test("decode stub is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = Multimodal.pipeline(spark, docs).collect().sortBy(_.doc_id)
    val b = Multimodal.pipeline(spark, docs.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("frame sampling emits ceil(n_frames/stride) frames per doc, deterministic") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = Multimodal.attachPayload(docs).as[Multimodal.MediaRecord]
    val stride = 2
    val frames = Multimodal.sampleFrames(media, stride).collect()
    // Per-doc frame count derives from the same stub decode pipeline() uses.
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

  test("frame sampling survives payloads shorter than the stub's frame count") {
    import spark.implicits._
    // 3-byte payloads: the hash-derived frame count can exceed the length;
    // only frames whose window starts inside the payload may be emitted.
    val tiny = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, Array[Byte](1, 2, 3)),
      Multimodal.MediaRecord(2L, Array[Byte](7)),
      Multimodal.MediaRecord(3L, Array.empty[Byte])))
    val frames = Multimodal.sampleFrames(tiny, stride = 1, resize = 1).collect()
    frames.foreach { f =>
      assert(f.n_bytes >= 1, s"empty frame emitted for doc ${f.doc_id}")
    }
    assert(!frames.exists(_.doc_id == 3L)) // empty payload → no frames
  }

  test("resize stub keeps every k-th byte (ceil(n/k) bytes)") {
    val bytes = Array.tabulate[Byte](10)(_.toByte)
    assert(Multimodal.resizeStub(bytes, 4).toSeq == Seq[Byte](0, 4, 8))
    assert(Multimodal.resizeStub(bytes, 1).toSeq == bytes.toSeq)
    assert(Multimodal.resizeStub(Array.empty[Byte], 3).isEmpty)
  }

  test("frame features agree with sampled frames; m3 pools the smallest-index argmax keyframe") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val media = Multimodal.attachPayload(docs).as[Multimodal.MediaRecord]
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

  test("payload bytes equal UTF-8 text length for ASCII corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    import org.apache.spark.sql.functions._
    val mismatch = Multimodal.pipeline(spark, docs).toDF()
      .join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")))
      .count()
    assert(mismatch == 0)
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
