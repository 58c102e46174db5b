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

  test("payload bytes equal UTF-8 text length for ASCII corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    import org.apache.spark.sql.functions._
    val mismatch = Multimodal.pipeline(spark, docs).toDF()
      .join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")))
      .count()
    assert(mismatch == 0)
  }
}
