package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins s14's recall floor (round-13 verdict #3): the 4-byte-band pigeonhole
  * — hamming ≤ 3 CANNOT dodge all four bands — exhaustively as a bit-level
  * property, then end-to-end on the corpus: every brute-force neighbour at
  * hamming ≤ 3 either appears in s14's top-k or was crowded out by a full
  * top-k of equal-or-closer candidates (the only legitimate absence).
  */
class HammingAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pigeonhole floor, exhaustively: <=3 differing bits always leave a byte band intact") {
    // 4 disjoint 8-bit bands over 32 bits; 3 flipped bits touch at most 3
    // bands. Exhaustive over every 1-, 2-, 3-bit flip set (5488 masks) for
    // several base signatures — the property is mask-only, the bases just
    // guard against accidental value dependence in the band extraction.
    val flips = for {
      a <- 0 until 32; b <- a to 31; c <- b to 31
    } yield (1L << a) | (1L << b) | (1L << c) // a==b==c gives 1-bit, a==b 2-bit
    def bands(v: Long): Seq[Long] = (0 until 4).map(i => (v >> (i * 8)) & 255L)
    for (base <- Seq(0L, 0xFFFFFFFFL, 0x5A5A5A5AL, 0x12345678L); m <- flips) {
      val other = base ^ m
      assert(bands(base).zip(bands(other)).exists { case (x, y) => x == y },
        f"no shared band for base=$base%08x mask=$m%08x")
    }
  }

  test("corpus recall floor at sf0.001: hamming<=3 neighbours surface or are crowded out by closer ones") {
    val sigs = D3SimHash.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = S14AnnHamming.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))) // (probe, doc, hamming)
      .groupBy(_._1)
    val probes = sigs.keys.filter(_ % 50 == 0).toSeq
    assert(probes.nonEmpty)
    var floorPairs = 0
    for (p <- probes; (d, s) <- sigs if d != p) {
      val ham = java.lang.Long.bitCount(sigs(p) ^ s)
      if (ham <= 3) {
        floorPairs += 1
        val rows = out.getOrElse(p, Array.empty)
        val present = rows.exists(_._2 == d)
        // absent is only legal when the top-k was full of candidates at
        // least as close (ties broken by doc_id, so an absent tie must have
        // a larger id than every kept tie at the cut)
        assert(present || (rows.length == S14AnnHamming.topK &&
          rows.map(_._3).max <= ham),
          s"probe $p lost hamming-$ham neighbour $d without a full closer top-k")
      }
    }
    assert(floorPairs > 0, "fixture vacuous: no hamming<=3 probe pairs at sf0.001")
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
