package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable

/** m1: multimodal metadata extraction, declarative path — binary payload
  * sizes plus hash-derived SYNTHETIC media dimensions. This row's job is
  * the binary-column PLUMBING (string→blob cast, octet_length, and a
  * metadata projection that never shuffles) agreeing between engines; the
  * REAL decoders live in m2–m6 ([[graft.operators.Multimodal.decodeAvi]] /
  * decodePpm / decodeWav), so the hash-derived dimensions here are a
  * deliberate declarative device, not a decode claim.
  */
object M1MultimodalMeta extends GraftQuery {
  val name = "m1_multimodal_meta"
  val describe = "binary payload metadata: sizes + deterministic fake decode dimensions"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val h = Portable.hash60(concat(lit("m:"), col("text")))
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      length(col("text").cast("binary")).cast("long").as("n_bytes"),
      (lit(16) + pmod(h, lit(1024L))).cast("int").as("width"),
      (lit(16) + pmod(shiftright(h, 10), lit(1024L))).cast("int").as("height"),
      (lit(1) + pmod(shiftright(h, 20), lit(16L))).cast("int").as("n_frames"))
  }

  val oracle = {
    val h = Portable.hash60Sql("'m:' || text")
    Some(
      s"""WITH t AS (SELECT doc_id, text, $h AS h FROM documents)
         |SELECT doc_id,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       CAST(16 + h % 1024 AS INT) AS width,
         |       CAST(16 + (h >> 10) % 1024 AS INT) AS height,
         |       CAST(1 + (h >> 20) % 16 AS INT) AS n_frames
         |FROM t""".stripMargin)
  }
}

/** m2: frame sampling + downscale over PARSED video containers — the
  * video-shaped half of the multimodal surface ([[graft.operators.Multimodal
  * .sampleFrames]]): each payload is a complete, spec-valid uncompressed AVI
  * ([[graft.operators.Multimodal.aviFixturePayload]]) and
  * [[graft.operators.Multimodal.decodeAvi]] is a GENUINE RIFF container
  * parser — hdrl/strl/movi list walk, avih + BITMAPINFOHEADER validation,
  * `00db` frame-chunk collection with per-frame size checks — so the
  * emitted frames are genuinely parsed 8×4 rasters, every 2nd one,
  * decimated 4×, as (doc_id, frame_idx, n_bytes).
  *
  * Oracle: the fixture's rasters are the document's UTF-8 bytes repeated
  * cyclically with frame count `min(16, 1 + len/64)` (the m5/m6 replay
  * discipline — ASCII corpus ⇒ `ord(substr)` enumerates payload bytes), so
  * DuckDB replays the sampled-frame grid from the text alone; a mis-parsed
  * chunk boundary, frame count, or raster window turns the gate red — the
  * container parse itself is what is under test.
  *
  * Scale: flatMap fan-out happens executor-side after columnar pruning has
  * already limited the scan to (doc_id, payload); output partitioning
  * follows the input, no shuffle.
  */
object M2FrameSample extends GraftQuery {
  val name = "m2_frame_sample"
  val describe = "REAL AVI parse: frame sampling (stride 2) + 4x decimation over parsed rasters"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.sampleFrames(
      Multimodal.aviMedia(spark, Tables.documents(spark, sfDir)))
      .select(col("doc_id"), col("frame_idx"), col("n_bytes"))
  }

  val oracle = Some(
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |f AS (
      |  SELECT doc_id, least(16, 1 + len // 64) AS frames FROM b),
      |fr AS (
      |  SELECT doc_id, unnest(range(0, frames, 2)) AS fi FROM f)
      |SELECT doc_id, CAST(fi AS INT) AS frame_idx, CAST(8 AS INT) AS n_bytes
      |FROM fr""".stripMargin)
}

/** m3: keyframe selection + per-video feature pooling over PARSED frames —
  * the feature-extract stage of the multimodal surface
  * ([[graft.operators.Multimodal.frameFeatures]]): REAL AVI container parse
  * (m2's decoder) → decimate → per-frame integer saliency score (byte-sum
  * of the decimated raster), then ONE partial+final aggregate pools per
  * video: frame count, decimated byte count, score totals, the keyframe
  * (max score, ties to the SMALLEST frame index via struct ordering on
  * (score, -frame_idx)), and a rounded mean-byte summary.
  *
  * Engine-exactness: every aggregated quantity is an integer (associative,
  * order-free — no float-accumulation hazard across engines); the only
  * float, mean_byte, is a single division of two exact integers per group,
  * which IEEE defines exactly, rounded to 6 decimals on both sides. The
  * oracle replays the fixture's cyclic-raster construction (frame f,
  * decimated byte j = text byte (32·f + 4·j) mod len) — so a parser that
  * mis-strides the raster or miscounts frames turns the gate red.
  *
  * Scale: the payload column is pruned away right after the executor-side
  * flatMap — only O(frames-per-video) integer rows shuffle into the
  * doc_id-keyed aggregate (map-side partials make that ~1 row per video per
  * partition). The keyframe argmax rides the same aggregate as a struct
  * max, not a separate window pass.
  */
object M3KeyframePool extends GraftQuery {
  val name = "m3_keyframe"
  val describe = "REAL AVI parse: frame saliency pooled per video + keyframe argmax"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.frameFeatures(
      Multimodal.aviMedia(spark, Tables.documents(spark, sfDir)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_frames"),
        sum(col("n_resized")).as("resized_bytes"),
        sum(col("score")).as("sum_bytes"),
        max(struct(col("score").as("s"), (-col("frame_idx")).as("nfi"))).as("mx"))
      .select(
        col("doc_id"),
        col("n_frames"),
        col("resized_bytes"),
        col("sum_bytes"),
        (-col("mx.nfi")).cast("int").as("keyframe_idx"),
        col("mx.s").as("keyframe_score"),
        round(col("sum_bytes").cast("double") / col("resized_bytes"), 6).as("mean_byte"))
  }

  val oracle = Some(
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len,
      |         list_transform(range(1, length(text) + 1),
      |                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bytes
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |f AS (
      |  SELECT doc_id, len, bytes, least(16, 1 + len // 64) AS frames FROM b),
      |fr AS (
      |  SELECT doc_id, len, bytes, unnest(range(0, frames, 2)) AS fi FROM f),
      |sc AS (
      |  SELECT doc_id, fi, 8 AS nres,
      |         CAST(list_reduce(list_transform(range(0, 8),
      |              j -> bytes[CAST((fi * 32 + 4 * j) % len AS INT) + 1]),
      |              (a, x) -> a + x) AS BIGINT) AS score
      |  FROM fr),
      |rk AS (
      |  SELECT doc_id, fi, nres, score,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, fi ASC) AS rn
      |  FROM sc)
      |SELECT doc_id,
      |       CAST(COUNT(*) AS INT) AS n_frames,
      |       CAST(SUM(nres) AS BIGINT) AS resized_bytes,
      |       CAST(SUM(score) AS BIGINT) AS sum_bytes,
      |       CAST(MAX(CASE WHEN rn = 1 THEN fi END) AS INT) AS keyframe_idx,
      |       MAX(CASE WHEN rn = 1 THEN score END) AS keyframe_score,
      |       round(CAST(SUM(score) AS DOUBLE) / SUM(nres), 6) AS mean_byte
      |FROM rk GROUP BY doc_id""".stripMargin)
}

/** m5: REAL image decode — the m-family row that is NOT a stub: payloads
  * are complete binary-PPM (netpbm P6) images and
  * [[graft.operators.Multimodal.decodePpm]] is a genuine decoder — ASCII
  * header parse (magic, dimensions, maxval, comments/whitespace per the
  * public netpbm spec), raster bounds check, invalid-payload drop — with
  * per-channel pixel sums and mean brightness computed from the DECODED
  * raster, not from construction knowledge. The fixture payloads are built
  * from the documents' UTF-8 bytes (this sandbox ships no media files), but
  * the decoder would accept any netpbm tool's output unchanged; only the
  * payload SOURCE is synthetic, the decode is real.
  *
  * Oracle: the raster is the text's bytes repeated cyclically under an
  * 8-wide geometry, so DuckDB replays the decoded channel sums from the
  * text alone (the m2/m3 byte-replay discipline; ASCII corpus ⇒
  * `ord(substr)` enumerates payload bytes). If the decoder mis-parses a
  * header or mis-strides the raster, the sums diverge and the hash gate
  * goes red — the decode itself is what is under test.
  *
  * Scale: identical to m2/m3 — decode inside the scan partition via typed
  * mapPartitions, only O(1) integers per image continue.
  */
object M5ImageDecode extends GraftQuery {
  val name = "m5_image_decode"
  val describe = "REAL binary-PPM decode: per-channel pixel sums + brightness from parsed rasters"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => Multimodal.MediaRecord(id, Multimodal.ppmFixturePayload(t)) }
    Multimodal.decodeImages(media).toDF()
  }

  val oracle = Some(
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len,
      |         list_transform(range(1, length(text) + 1),
      |                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bytes
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, len, bytes, 8 AS w, 1 + (len // 24) AS h
      |  FROM b WHERE len > 0),
      |px AS (
      |  SELECT doc_id, w, h, w * h AS n,
      |         list_transform(range(0, w * h * 3),
      |                        p -> bytes[CAST(p % len AS INT) + 1]) AS data
      |  FROM d),
      |s AS (
      |  SELECT doc_id, w, h, n,
      |         CAST(list_reduce(list_transform(range(0, n), i -> data[CAST(3 * i AS INT) + 1]), (a, x) -> a + x) AS BIGINT) AS sum_r,
      |         CAST(list_reduce(list_transform(range(0, n), i -> data[CAST(3 * i + 1 AS INT) + 1]), (a, x) -> a + x) AS BIGINT) AS sum_g,
      |         CAST(list_reduce(list_transform(range(0, n), i -> data[CAST(3 * i + 2 AS INT) + 1]), (a, x) -> a + x) AS BIGINT) AS sum_b
      |  FROM px)
      |SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |       CAST(n AS INT) AS n_pixels, sum_r, sum_g, sum_b,
      |       round(CAST(sum_r + sum_g + sum_b AS DOUBLE) / (3 * n), 6) AS mean_brightness
      |FROM s""".stripMargin)
}

/** m6: REAL audio decode — the audio twin of m5: payloads are complete
  * RIFF/WAVE PCM files (fmt chunk + a junk LIST chunk the walker must skip
  * under the odd-size pad rule + data chunk) and
  * [[graft.operators.Multimodal.decodeWav]] is a genuine container parser;
  * sample statistics (count, duration, sum, peak, mean amplitude) are
  * folded from the DECODED little-endian int16 stream, not from
  * construction knowledge. Fixture samples are the document's byte values,
  * so the DuckDB oracle replays the decoded statistics from the text alone
  * (the m5 discipline); a mis-parsed chunk boundary or sample stride turns
  * the gate red.
  *
  * Scale: decode inside the scan partition via typed mapPartitions, O(1)
  * integers per clip continue — identical to m5.
  */
object M6AudioDecode extends GraftQuery {
  val name = "m6_audio_decode"
  val describe = "REAL RIFF/WAVE PCM decode: sample stats from parsed int16 streams"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => Multimodal.MediaRecord(id, Multimodal.wavFixturePayload(t)) }
    Multimodal.decodeAudio(media).toDF()
  }

  val oracle = Some(
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS n,
      |         list_transform(range(1, length(text) + 1),
      |                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bytes
      |  FROM documents WHERE octet_length(encode(text)) > 0),
      |s AS (
      |  SELECT doc_id, n,
      |         CAST(list_reduce(bytes, (a, x) -> a + x) AS BIGINT) AS sum_samples,
      |         CAST(list_reduce(bytes, (a, x) -> greatest(a, x)) AS INT) AS max_amp
      |  FROM b)
      |SELECT doc_id, CAST(n AS INT) AS n_samples,
      |       CAST(8000 AS INT) AS sample_rate,
      |       CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
      |       sum_samples, max_amp,
      |       round(CAST(sum_samples AS DOUBLE) / n, 6) AS mean_amp
      |FROM s""".stripMargin)
}

/** m4: video fingerprint dedup over PARSED frames — m-family's d1: group
  * videos by their quantized frame-score signature
  * ([[graft.operators.Multimodal.videoSignatures]]; two videos match iff
  * every sampled PARSED frame lands in the same saliency bucket) and
  * report, per video, its match-group size and canonical (min-id)
  * representative. The perceptual-hash dedup shape: fingerprint inside the
  * decode pass (REAL AVI parse, m2's decoder), then ONE groupBy on the
  * O(frames) signature — the payload bytes never shuffle, and the
  * signature join is an equi-join on an array key, never pairwise.
  *
  * Oracle: m3's cyclic-raster frame-score replay extended with an ordered
  * list-aggregation signature and a signature-keyed self-group. DuckDB
  * groups and joins on LIST values natively, so even the array-keyed
  * aggregate sits under the exact three-way gate.
  */
object M4VideoDedup extends GraftQuery {
  val name = "m4_video_dedup"
  val describe = "video fingerprint dedup: quantized parsed-frame signatures grouped (m-family d1)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Multimodal
    val sigs = Multimodal.videoSignatures(
      Multimodal.aviMedia(spark, Tables.documents(spark, sfDir)))
      .toDF("doc_id", "sig")
    val groups = sigs.groupBy(col("sig"))
      .agg(count(lit(1)).as("match_count"), min(col("doc_id")).as("canonical_id"))
    sigs.join(groups, "sig")
      .select(col("doc_id"), size(col("sig")).as("n_frames_scored"),
        col("match_count"), col("canonical_id"))
  }

  /** CTE chain ending in `${p}sig(doc_id, sig)` — the signature replay,
    * prefix-parameterized so m9's composite oracle composes it next to
    * m8's envelope chain (the hitsSqlCtes discipline).
    */
  private[queries] def sigCtesSql(p: String): String =
    s"""${p}b AS (
       |  SELECT doc_id, octet_length(encode(text)) AS len,
       |         list_transform(range(1, length(text) + 1),
       |                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bytes
       |  FROM documents WHERE octet_length(encode(text)) > 0),
       |${p}f AS (
       |  SELECT doc_id, len, bytes, least(16, 1 + len // 64) AS frames FROM ${p}b),
       |${p}fr AS (
       |  SELECT doc_id, len, bytes, unnest(range(0, frames, 2)) AS fi FROM ${p}f),
       |${p}sc AS (
       |  SELECT doc_id, fi,
       |         CAST(list_reduce(list_transform(range(0, 8),
       |              j -> bytes[CAST((fi * 32 + 4 * j) % len AS INT) + 1]),
       |              (a, x) -> a + x) AS BIGINT) >> 7 AS q
       |  FROM ${p}fr),
       |${p}sig AS (SELECT doc_id, list(q ORDER BY fi) AS sig FROM ${p}sc GROUP BY doc_id)""".stripMargin

  val oracle = Some(
    s"""WITH ${sigCtesSql("")},
       |grp AS (
       |  SELECT sig, count(*) AS match_count, min(doc_id) AS canonical_id
       |  FROM sig GROUP BY sig)
       |SELECT s.doc_id, CAST(len(s.sig) AS INT) AS n_frames_scored,
       |       g.match_count, g.canonical_id
       |FROM sig s JOIN grp g ON s.sig = g.sig""".stripMargin)
}

/** m7: perceptual image dedup over GENUINELY DECODED rasters — d1's
  * exact-dedup shape lifted from byte space into pixel space: each
  * document's spec-valid PPM payload is parsed by the real decoder
  * ([[graft.operators.Multimodal.decodePpm]]), an average-hash fingerprint
  * is computed from the decoded pixels (grayscale → 4×4 cell lattice by
  * index scaling → one bit per cell, cell mean vs image mean compared
  * CROSS-MULTIPLIED so no division ever rounds — every bit exact integer
  * arithmetic), and images collapse on identical fingerprints via a
  * map-side-combinable groupBy + fingerprint-keyed rejoin (d1's shape).
  *
  * The oracle replays the whole construction from the text alone (the m5
  * discipline): raster bytes → grayscale → cell sums → cross-multiplied
  * bits → packed hash → survivor window. A mis-parsed header, a wrong cell
  * boundary, or a rounding division anywhere flips the gate.
  *
  * Scale: decode + hash run inside the scan partition (the payload never
  * shuffles; only doc_id + 16 bits continue), then a partial-aggregated
  * groupBy + keyed rejoin — per-task state stays bounded under ANY
  * fingerprint-bucket mass (a 16-bit key at billions of images means
  * millions of rows per bucket; a bucket-partitioned window would put each
  * bucket in one task), the standard first stage of perceptual dedup. Production widens to 8×8/64 bits and adds a
  * hamming-ball verify within buckets (d6's banding shape); the
  * fingerprint-and-group contract is identical.
  */
object M7ImagePhash extends GraftQuery {
  val name = "m7_image_phash"
  val describe = "perceptual aHash dedup over decoded PPM rasters: exact-integer 4x4 fingerprint + survivor collapse"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => Multimodal.MediaRecord(id, Multimodal.ppmFixturePayload(t)) }
    // Survivor collapse as map-side-combinable groupBy + fingerprint-keyed
    // rejoin, NOT a full-partition window: a window keyed on the 16-bit
    // fingerprint puts every row of a bucket in ONE task — ≥millions of rows
    // per bucket at 100 TB — while partial aggregation bounds per-task state
    // regardless of bucket mass and the join STREAMS the probe side. The
    // fingerprint frame is persisted so the decode runs once, not once per
    // join side.
    val hashes = graft.CacheScope.persisted(Multimodal.imagePhashes(media).toDF())
    val groups = hashes.groupBy(col("phash"))
      .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_same"))
    hashes.join(groups, "phash")
      .select(col("doc_id"), col("phash"), col("survivor"), col("n_same"))
  }

  val oracle = Some(
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text)) AS len,
      |         list_transform(range(1, length(text) + 1),
      |                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bytes
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, len, bytes, 8 AS w, 1 + (len // 24) AS h
      |  FROM b WHERE len > 0),
      |px AS (
      |  SELECT doc_id, w, h, w * h AS n,
      |         list_transform(range(0, w * h * 3),
      |                        p -> bytes[CAST(p % len AS INT) + 1]) AS data
      |  FROM d),
      |g AS (
      |  SELECT doc_id, w, h, n,
      |         list_transform(range(0, n),
      |                        i -> (data[CAST(3 * i AS INT) + 1]
      |                            + data[CAST(3 * i + 1 AS INT) + 1]
      |                            + data[CAST(3 * i + 2 AS INT) + 1]) // 3) AS gray
      |  FROM px),
      |pix AS (SELECT doc_id, w, h, n, gray, unnest(range(0, n)) AS i FROM g),
      |pc AS (
      |  SELECT doc_id, n, gray[CAST(i AS INT) + 1] AS gv,
      |         CAST(((i // w) * 4) // h * 4 + ((i % w) * 4) // w AS INT) AS c
      |  FROM pix),
      |cs AS (
      |  SELECT doc_id, c, CAST(sum(gv) AS BIGINT) AS csum, count(*) AS ccnt
      |  FROM pc GROUP BY doc_id, c),
      |tot AS (
      |  SELECT doc_id, n, CAST(sum(gv) AS BIGINT) AS tsum
      |  FROM pc GROUP BY doc_id, n),
      |ph AS (
      |  SELECT s.doc_id,
      |         CAST(sum(CASE WHEN s.csum * t.n > t.tsum * s.ccnt
      |                       THEN CAST(1 AS BIGINT) << s.c ELSE 0 END) AS BIGINT) AS phash
      |  FROM cs s JOIN tot t USING (doc_id)
      |  GROUP BY s.doc_id)
      |SELECT doc_id, phash,
      |       min(doc_id) OVER (PARTITION BY phash) AS survivor,
      |       count(*) OVER (PARTITION BY phash) AS n_same
      |FROM ph""".stripMargin)
}

/** m8: perceptual audio dedup over GENUINELY DECODED PCM — the audio leg
  * of the m-family dedup trio (m4 groups videos by frame-score signature,
  * m7 images by aHash): each spec-valid WAV fixture payload is parsed by
  * the real container walker ([[graft.operators.Multimodal.decodeWav]]),
  * its amplitude envelope quantized into a 16-bit fingerprint
  * ([[graft.operators.Multimodal.audioEnvelopes]] — 8 windows × 2 bits,
  * exact integer arithmetic), and clips collapse on identical envelopes
  * via the m7 survivor collapse (groupBy + rejoin).
  *
  * The oracle replays the whole construction from the text alone (the
  * m5/m6 discipline: fixture samples are the document's byte values):
  * window boundaries by the same `(w·n) div 8` lattice, abs-sum, the two
  * integer divisions, the base-4 packing fold, then the fingerprint-keyed
  * survivor window. A mis-parsed chunk boundary, a sample-stride slip, or
  * a rounding division anywhere flips the gate.
  *
  * Scale: decode + envelope inside the scan partition (payloads never
  * shuffle; 16 bits per clip continue), partial-aggregated groupBy +
  * keyed rejoin — identical shape and cost model to m7.
  */
object M8AudioEnvelope extends GraftQuery {
  val name = "m8_audio_envelope"
  val describe = "perceptual audio dedup: quantized amplitude-envelope fingerprint over decoded PCM + survivor collapse"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => Multimodal.MediaRecord(id, Multimodal.wavFixturePayload(t)) }
    // groupBy + rejoin, not a full-partition window — m7's scale argument
    // (bounded per-task state under any fingerprint-bucket mass) applies
    // verbatim to the 16-bit envelope hash.
    val envs = graft.CacheScope.persisted(Multimodal.audioEnvelopes(media).toDF())
    val groups = envs.groupBy(col("env_hash"))
      .agg(min(col("doc_id")).as("survivor"), count(lit(1)).as("n_same"))
    envs.join(groups, "env_hash")
      .select(col("doc_id"), col("env_hash"), col("survivor"), col("n_same"))
  }

  /** CTE chain ending in `${p}fp(doc_id, env_hash)` — the envelope replay,
    * prefix-parameterized for m9's composite oracle (sigCtesSql's twin).
    */
  private[queries] def envCtesSql(p: String): String =
    s"""${p}b AS (
       |  SELECT doc_id, octet_length(encode(text)) AS n,
       |         list_transform(range(1, length(text) + 1),
       |                        i -> CAST(ord(substr(text, i, 1)) AS BIGINT)) AS bytes
       |  FROM documents WHERE octet_length(encode(text)) >= 8),
       |${p}wq AS (SELECT doc_id, n, bytes, unnest(range(0, 8)) AS w FROM ${p}b),
       |${p}qs AS (
       |  SELECT doc_id, w,
       |         least(3, (CAST(list_reduce(
       |             bytes[CAST((w * n) // 8 AS INT) + 1 : CAST(((w + 1) * n) // 8 AS INT)],
       |             (a, x) -> a + x) AS BIGINT)
       |           // (((w + 1) * n) // 8 - (w * n) // 8)) // 64) AS q
       |  FROM ${p}wq),
       |${p}fp AS (
       |  SELECT doc_id, list_reduce(list(q ORDER BY w), (a, x) -> a * 4 + x) AS env_hash
       |  FROM ${p}qs GROUP BY doc_id)""".stripMargin

  val oracle = Some(
    s"""WITH ${envCtesSql("")}
       |SELECT doc_id, env_hash,
       |       min(doc_id) OVER (PARTITION BY env_hash) AS survivor,
       |       count(*) OVER (PARTITION BY env_hash) AS n_same
       |FROM fp""".stripMargin)
}

/** m9: composite AUDIO+VIDEO dedup — the modality-fusion form of the
  * m-family's collapse: a clip pair is a duplicate only when BOTH its
  * parsed-frame video signature (m4) AND its decoded-PCM amplitude
  * envelope (m8) agree. Single-modality fingerprints collide by design
  * (they are coarse quantizations); requiring the pair cuts the false-
  * collapse rate multiplicatively — the standard trick for AV content
  * (match video hash AND audio hash before collapsing a re-upload).
  *
  * Composition: the two fingerprint stages are m4's and m8's OWN
  * operators over the same documents (one AVI decode pass, one WAV decode
  * pass — payloads never shuffle, only doc_id + fingerprints continue),
  * joined doc_id-keyed, then d1's groupBy + composite-keyed rejoin. The
  * oracle composes the two factored replay chains (sigCtesSql /
  * envCtesSql) with prefixes — a drift in EITHER modality's replay flips
  * this gate too.
  */
object M9AvDedup extends GraftQuery {
  val name = "m9_av_dedup"
  val describe = "composite multimodal dedup: collapse only when video signature AND audio envelope both match"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Tables.documents(spark, sfDir)
    val sigs = Multimodal.videoSignatures(Multimodal.aviMedia(spark, docs))
      .toDF("doc_id", "sig")
    val wav = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => Multimodal.MediaRecord(id, Multimodal.wavFixturePayload(t)) }
    val envs = Multimodal.audioEnvelopes(wav).toDF()
    collapseOn(graft.CacheScope.persisted(sigs.join(envs, "doc_id")))
  }

  /** The composite collapse over any (doc_id, sig, env_hash) frame — the
    * seam AvDedupSpec's synthetic discrimination pin uses (on the driver
    * corpus both fingerprints derive from the same bytes, so the video
    * signature refines the audio envelope EVERYWHERE and the composite
    * equals the video collapse — honest, but it leaves the fusion's
    * discriminating case unexercised without a crafted frame).
    */
  private[queries] def collapseOn(j: DataFrame): DataFrame = {
    val groups = j.groupBy(col("sig"), col("env_hash"))
      .agg(count(lit(1)).as("match_count"), min(col("doc_id")).as("canonical_id"))
    j.join(groups, Seq("sig", "env_hash"))
      .select(col("doc_id"), col("env_hash"), col("match_count"), col("canonical_id"))
  }

  val oracle = Some(
    s"""WITH ${M4VideoDedup.sigCtesSql("v")},
       |${M8AudioEnvelope.envCtesSql("a")},
       |j AS (
       |  SELECT s.doc_id, s.sig, f.env_hash
       |  FROM vsig s JOIN afp f USING (doc_id)),
       |grp AS (
       |  SELECT sig, env_hash, count(*) AS match_count, min(doc_id) AS canonical_id
       |  FROM j GROUP BY sig, env_hash)
       |SELECT j.doc_id, j.env_hash, g.match_count, g.canonical_id
       |FROM j JOIN grp g ON j.sig = g.sig AND j.env_hash = g.env_hash""".stripMargin)
}
