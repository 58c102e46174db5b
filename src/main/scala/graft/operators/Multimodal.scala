package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in executor-parallel batches.
  *
  * The decode itself is STUBBED (no image/audio codecs in this environment)
  * with a deterministic function of the payload bytes — clearly marked
  * below. Everything around it is the real Spark shape a production decode
  * would use:
  *   - schema: `payload BINARY` + `media STRUCT<format,width,height,n_frames>`
  *   - partition-batched execution via `mapPartitions` on a typed Dataset
  *     (the Scala-side analogue of arrow-batched decode UDFs: one decoder
  *     instantiation per partition, streamed row batches, no driver
  *     involvement)
  *   - declarative pre-filter/projection so only selected payloads are ever
  *     materialized.
  *
  * At 100 TB the payload column dominates storage: keep it in its own
  * parquet column (columnar pruning means metadata-only queries never read
  * it), size `maxPartitionBytes` to a few hundred MB so a partition of
  * payloads fits executor memory, and decode AFTER pushdown filters.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** STUB DECODER — deterministic fake standing in for an image/video codec.
    * Derives "dimensions" from a stable byte hash and "pixel stats" from the
    * raw bytes. Replace the body with a real codec call; the signature and
    * batching contract are the production ones.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    var h = 1125899906842597L // FNV-ish rolling hash over the payload
    var i = 0
    var sum = 0L
    while (i < payload.length) {
      h = h * 31 + (payload(i) & 0xff)
      sum += (payload(i) & 0xff)
      i += 1
    }
    val pos = h & Long.MaxValue
    val width = 16 + (pos % 1024).toInt
    val height = 16 + ((pos >> 10) % 1024).toInt
    val frames = 1 + ((pos >> 20) % 16).toInt
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    (width, height, frames, mean)
  }

  /** Attach a binary payload column (here faked from text — in production
    * this IS the stored media column).
    */
  def attachPayload(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Partition-batched feature extraction: one decode pass per executor
    * partition, typed end to end.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder setup would go here (codec init, scratch buffers).
      it.map { r =>
        val (w, h, f, mean) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length, w, h, f, mean)
      }
    }
  }

  def pipeline(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(attachPayload(documents).as[MediaRecord])
  }

  final case class FrameSample(doc_id: Long, frame_idx: Int, n_bytes: Int, frame: Array[Byte])
  final case class FrameFeature(doc_id: Long, frame_idx: Int, n_resized: Int, score: Long)

  /** RESIZE STUB — stands in for an image downscale: keeps every k-th byte.
    * A real implementation swaps the body for a codec resize; callers see
    * the same (bytes in → smaller bytes out) contract.
    */
  def resizeStub(frame: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 1, "resize factor must be >= 1")
    val out = new Array[Byte]((frame.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = frame(i * k); i += 1 }
    out
  }

  /** Deterministic frame sampling: treats the payload as the `n_frames`
    * equal-width chunks the stub decoder reports (stand-in for a video
    * container parser) and emits every `stride`-th frame, resized by
    * `resize`. The flatMap-over-partitions shape is the production one:
    * per-partition decoder setup, multiple output rows per input row, fully
    * executor-parallel — the payload column never visits the driver.
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      stride: Int = 2,
      resize: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder/scaler setup would go here.
      it.flatMap { r =>
        val (_, _, frames, _) = decodeStub(r.payload)
        val width = math.max(1, r.payload.length / math.max(1, frames))
        // The stub's frame count is hash-derived, so a payload SHORTER than
        // its frame count would put later frame offsets past the end —
        // emit only frames whose window starts inside the payload.
        (0 until frames by stride).iterator
          .takeWhile(f => f * width < r.payload.length)
          .map { f =>
            val from = f * width
            val until = math.min(r.payload.length, from + width)
            val frame = resizeStub(java.util.Arrays.copyOfRange(r.payload, from, until), resize)
            FrameSample(r.doc_id, f, frame.length, frame)
          }
      }
    }
  }

  /** Per-frame FEATURE EXTRACTION: decode → resize → score, the pipeline
    * order a production keyframe selector uses (score an embedding of the
    * downscaled frame, not the full-resolution one). The stub score is the
    * integer byte-sum of the RESIZED frame — deterministic, exactly
    * replayable in SQL, and integer so downstream aggregation/comparison is
    * associative and engine-exact (no float-order hazards). Swap the score
    * line for a real frame-embedding call; the (payload in → small typed
    * rows out) mapPartitions contract is the production shape, and the
    * heavy payload bytes never leave the scan partition — only O(frames)
    * integers per video continue into the pooling aggregate.
    */
  def frameFeatures(
      media: Dataset[MediaRecord],
      stride: Int = 2,
      resize: Int = 4): Dataset[FrameFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder/scorer setup would go here.
      it.flatMap { r =>
        val (_, _, frames, _) = decodeStub(r.payload)
        val width = math.max(1, r.payload.length / math.max(1, frames))
        (0 until frames by stride).iterator
          .takeWhile(f => f * width < r.payload.length)
          .map { f =>
            val from = f * width
            val until = math.min(r.payload.length, from + width)
            val resized = resizeStub(java.util.Arrays.copyOfRange(r.payload, from, until), resize)
            var s = 0L
            var i = 0
            while (i < resized.length) { s += resized(i) & 0xff; i += 1 }
            FrameFeature(r.doc_id, f, resized.length, s)
          }
      }
    }
  }

  // ---- REAL image decode: binary netpbm (PPM P6) ----
  //
  // The stub paths above stand in for codecs this environment lacks; PPM
  // needs none — the format (netpbm, public spec) is an ASCII header
  // ("P6", width, height, maxval, with '#' comments and arbitrary
  // whitespace) followed by width·height packed RGB byte triples. The
  // parser below is a REAL decoder with the real failure modes (bad magic,
  // malformed header, truncated pixel data → None, the row-level
  // disposition a production decode stage emits), so m5's pixel statistics
  // are computed from genuinely DECODED pixels — the payload could have
  // been written by any netpbm tool.

  final case class PpmImage(width: Int, height: Int, maxval: Int, dataOffset: Int)

  /** Parse a P6 header; None for anything that is not a complete, valid
    * binary-PPM payload (wrong magic, non-numeric or missing header fields,
    * zero/negative dimensions, pixel data shorter than width·height·3).
    */
  def decodePpm(payload: Array[Byte]): Option[PpmImage] = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < payload.length) {
        val c = payload(i) & 0xff
        if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == 11 || c == 12) i += 1
        else go = false
      }
    }
    def int(): Int = { // -1 = malformed
      skipWs()
      val start = i
      var v = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9' && v < (1 << 24)) {
        v = v * 10 + (payload(i) - '0'); i += 1
      }
      if (i == start) -1 else v
    }
    val w = int(); val h = int(); val mv = int()
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 65535) return None
    // exactly ONE whitespace byte separates maxval from the raster
    if (i >= payload.length || !Character.isWhitespace(payload(i) & 0xff)) return None
    i += 1
    if (payload.length - i < w.toLong * h * 3) None
    else Some(PpmImage(w, h, mv, i))
  }

  final case class ImageFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_pixels: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long,
      mean_brightness: Double)

  /** Partition-batched REAL decode: parse each payload as PPM and compute
    * per-channel pixel sums + mean brightness from the decoded raster.
    * Invalid payloads are DROPPED (flatMap disposition) — the production
    * contract for a decode stage. Same mapPartitions shape as
    * [[extractFeatures]]; the payload bytes never leave the scan partition.
    */
  def decodeImages(media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodePpm(r.payload).map { img =>
          val n = img.width * img.height
          var sr = 0L; var sg = 0L; var sb = 0L
          var p = img.dataOffset
          var k = 0
          while (k < n) {
            sr += r.payload(p) & 0xff
            sg += r.payload(p + 1) & 0xff
            sb += r.payload(p + 2) & 0xff
            p += 3; k += 1
          }
          ImageFeatures(r.doc_id, img.width, img.height, n, sr, sg, sb,
            graft.functions.Rounding.roundTo((sr + sg + sb).toDouble / (3.0 * n), 6))
        }
      }
    }
  }

  /** Deterministic PPM fixture payload: a REAL, spec-valid P6 image (8-wide,
    * tall enough to hold the text) whose raster is the document's UTF-8
    * bytes repeated cyclically — so the oracle can replay the decoded pixel
    * sums from the text alone while the decoder parses an actual header it
    * has no construction knowledge of. Empty text yields an invalid payload
    * (no raster to build), which the decode stage drops — exercising the
    * disposition branch.
    */
  def ppmFixturePayload(text: String): Array[Byte] = {
    val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (tb.isEmpty) return Array[Byte]('X')
    val w = 8
    val h = 1 + tb.length / 24
    val header = s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val data = new Array[Byte](w * h * 3)
    var i = 0
    while (i < data.length) { data(i) = tb(i % tb.length); i += 1 }
    header ++ data
  }

  final case class VideoSignature(doc_id: Long, sig: Array[Long])

  /** Perceptual-hash-style VIDEO FINGERPRINT: the sequence of per-frame
    * saliency scores quantized by `>> shift`, in frame order — the
    * multimodal analogue of d1's content hash (two videos match iff every
    * sampled frame lands in the same score bucket). Computed entirely
    * inside the per-partition decode pass: the payload never shuffles, only
    * the O(frames) signature continues. A production system swaps the
    * score for a frame-embedding LSH bucket; the fingerprint-and-group
    * contract is identical.
    */
  def videoSignatures(
      media: Dataset[MediaRecord],
      stride: Int = 2,
      resize: Int = 4,
      shift: Int = 7): Dataset[VideoSignature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        if (r.payload.isEmpty) Iterator.empty
        else {
          val (_, _, frames, _) = decodeStub(r.payload)
          val width = math.max(1, r.payload.length / math.max(1, frames))
          val sig = (0 until frames by stride).iterator
            .takeWhile(f => f * width < r.payload.length)
            .map { f =>
              val from = f * width
              val until = math.min(r.payload.length, from + width)
              val resized = resizeStub(java.util.Arrays.copyOfRange(r.payload, from, until), resize)
              var s = 0L
              var i = 0
              while (i < resized.length) { s += resized(i) & 0xff; i += 1 }
              s >> shift
            }
            .toArray
          Iterator.single(VideoSignature(r.doc_id, sig))
        }
      }
    }
  }

  /** Parsed WAV geometry: PCM sample window inside the payload. */
  final case class WavAudio(sampleRate: Int, dataOffset: Int, nSamples: Int)

  /** REAL RIFF/WAVE decoder (the audio twin of [[decodePpm]]): validates
    * the RIFF container, WALKS the chunk list (skipping unknown chunks
    * with the spec's odd-size padding rule — a real file's LIST/INFO or
    * cue chunks must not break the parse), requires a PCM (`fmt ` code 1)
    * mono 16-bit stream, and bounds-checks the `data` chunk against the
    * payload. Any violation → None (disposition drop). Format reference:
    * the public RIFF/WAVE specification (multimedia programming interface,
    * IBM/Microsoft 1991) — chunk = 4-byte id + LE uint32 size + payload,
    * odd payloads padded by one byte.
    */
  def decodeWav(payload: Array[Byte]): Option[WavAudio] = {
    def le32(i: Int): Long =
      (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
        ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    def le16(i: Int): Int = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def tag(i: Int, s: String): Boolean =
      payload.length >= i + 4 && s.indices.forall(j => payload(i + j) == s(j).toByte)
    if (payload.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (code, channels, rate, bits)
    var data: Option[(Int, Int)] = None          // (offset, size)
    while (i + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
      val size = le32(i + 4)
      if (size < 0 || size > payload.length - (i + 8)) return None
      val sz = size.toInt
      if (tag(i, "fmt ")) {
        if (sz < 16) return None
        fmt = Some((le16(i + 8), le16(i + 10), le32(i + 12).toInt, le16(i + 22)))
      } else if (tag(i, "data")) {
        data = Some((i + 8, sz))
      }
      i += 8 + sz + (sz & 1) // spec: odd-sized chunks pad one byte
    }
    for {
      (code, ch, rate, bits) <- fmt
      if code == 1 && ch == 1 && bits == 16 && rate > 0
      (off, sz) <- data
      if sz % 2 == 0
    } yield WavAudio(rate, off, sz / 2)
  }

  final case class AudioFeatures(
      doc_id: Long,
      n_samples: Int,
      sample_rate: Int,
      duration_ms: Long,
      sum_samples: Long,
      max_amp: Int,
      mean_amp: Double)

  /** Partition-batched REAL audio decode: parse each payload as RIFF/WAVE
    * PCM and fold sample statistics from the DECODED little-endian int16
    * stream. Invalid payloads are dropped, same disposition contract as
    * [[decodeImages]]; payload bytes never leave the scan partition.
    */
  def decodeAudio(media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.payload).filter(_.nSamples > 0).map { a =>
          var s = 0L; var mx = 0
          var k = 0
          while (k < a.nSamples) {
            val p = a.dataOffset + 2 * k
            val v = ((r.payload(p) & 0xff) | (r.payload(p + 1) << 8)).toShort.toInt
            s += v
            val amp = math.abs(v)
            if (amp > mx) mx = amp
            k += 1
          }
          AudioFeatures(r.doc_id, a.nSamples, a.sampleRate,
            a.nSamples * 1000L / a.sampleRate, s, mx,
            graft.functions.Rounding.roundTo(s.toDouble / a.nSamples, 6))
        }
      }
    }
  }

  /** Deterministic WAV fixture payload: a REAL, spec-valid RIFF/WAVE PCM
    * file — fmt chunk, a junk `LIST` chunk the chunk-walker must skip, and
    * a data chunk whose int16 samples are the document's byte values — so
    * the oracle replays the decoded statistics from the text alone while
    * the decoder parses a container it has no construction knowledge of.
    * Empty text yields an invalid payload (dropped), exercising the
    * disposition branch like [[ppmFixturePayload]].
    */
  def wavFixturePayload(text: String): Array[Byte] = {
    val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (tb.isEmpty) return Array[Byte]('X')
    val rate = 8000
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    val dataSize = tb.length * 2
    val junk = "fixture".getBytes // 7 bytes: odd, exercises the pad rule
    tag("RIFF"); w32(4 + (8 + 16) + (8 + junk.length + 1) + (8 + dataSize)); tag("WAVE")
    tag("fmt "); w32(16)
    w16(1); w16(1); w32(rate); w32(rate * 2L); w16(2); w16(16)
    tag("LIST"); w32(junk.length); out.write(junk); out.write(0) // pad byte
    tag("data"); w32(dataSize)
    tb.foreach(b => w16(b & 0xff))
    out.toByteArray
  }
}
