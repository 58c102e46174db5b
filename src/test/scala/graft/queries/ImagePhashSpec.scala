package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal

/** m7's fingerprint beyond the replay oracle — the PERCEPTUAL claims that
  * make an average-hash worth computing, driven over hand-built spec-valid
  * PPM payloads (not the text fixture, so the raster geometry is chosen,
  * not inherited):
  *
  *  - robustness: a small perturbation that doesn't move any cell across
  *    the image mean leaves the fingerprint IDENTICAL (the property exact
  *    md5 dedup lacks and the reason perceptual hashing exists);
  *  - discrimination: inverting the pattern flips the fingerprint;
  *  - collapse: byte-identical rasters group onto the min-id survivor;
  *  - disposition: an invalid payload is dropped, never fingerprinted.
  */
class ImagePhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ppm(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val data = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3)
      data((y * w + x) * 3 + ch) = pixel(x, y).toByte
    header ++ data
  }

  private def phashes(recs: Seq[Multimodal.MediaRecord]): Map[Long, Long] = {
    import spark.implicits._
    Multimodal.imagePhashes(recs.toDS())
      .collect().map(p => p.doc_id -> p.phash).toMap
  }

  test("small perturbation keeps the fingerprint; inversion flips it; junk is dropped") {
    val bright = 200; val dark = 10
    val base = ppm(8, 8)((_, y) => if (y < 4) bright else dark)
    // one dark pixel nudged by +5: no cell mean crosses the image mean
    val nudged = ppm(8, 8)((x, y) =>
      if (y < 4) bright else if (x == 0 && y == 7) dark + 5 else dark)
    val inverted = ppm(8, 8)((_, y) => if (y < 4) dark else bright)
    val out = phashes(Seq(
      Multimodal.MediaRecord(1L, base),
      Multimodal.MediaRecord(2L, nudged),
      Multimodal.MediaRecord(3L, inverted),
      Multimodal.MediaRecord(4L, Array[Byte]('X', 'Y'))))
    assert(out.keySet == Set(1L, 2L, 3L), "invalid payload must be dropped, valid ones kept")
    assert(out(1L) == out(2L), "a sub-threshold perturbation must not move the fingerprint")
    assert(out(1L) != out(3L), "inverting the pattern must move the fingerprint")
    // the bright-top pattern sets exactly the top two cell rows' bits
    assert(out(1L) == 0xffL, f"expected top-half bits 0x00ff, got 0x${out(1L)}%04x")
    assert(out(3L) == 0xff00L, f"expected bottom-half bits 0xff00, got 0x${out(3L)}%04x")
  }

  test("byte-identical rasters collapse onto the min-id survivor in the query shape") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val img = ppm(8, 4)((x, _) => if (x < 4) 230 else 20)
    val other = ppm(8, 4)((x, _) => if (x < 4) 20 else 230)
    val w = Window.partitionBy(col("phash"))
    val rows = Multimodal.imagePhashes(Seq(
        Multimodal.MediaRecord(7L, img),
        Multimodal.MediaRecord(3L, img),
        Multimodal.MediaRecord(9L, other)).toDS()).toDF()
      .select(col("doc_id"), col("phash"),
        min(col("doc_id")).over(w).as("survivor"),
        count(lit(1)).over(w).as("n_same"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows(7L) == ((3L, 2L)) && rows(3L) == ((3L, 2L)),
      "identical rasters must share the min-id survivor")
    assert(rows(9L) == ((9L, 1L)), "a distinct raster must survive alone")
  }
}
