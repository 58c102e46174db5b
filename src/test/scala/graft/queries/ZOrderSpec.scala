package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the layout property q24 exists for — the thing the oracle's hash
  * can't express: Morton-curve storage units are ALIGNED 16×16 grid tiles,
  * so per-unit min/max stats prune multi-dimensionally.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every z-order unit is contained in one aligned 16x16 tile") {
    val units = Q24ZOrder.run(spark, TestSpark.sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(units.nonEmpty)
    for ((unit, n, minX, maxX, minY, maxY) <- units) {
      assert(n > 0)
      // 256 consecutive Morton cells fix the top 4 bits of both dims: the
      // unit's extent must sit inside ONE 16-aligned 16x16 tile.
      assert(minX / 16 == maxX / 16, s"unit $unit spans x tiles [$minX, $maxX]")
      assert(minY / 16 == maxY / 16, s"unit $unit spans y tiles [$minY, $maxY]")
    }
  }

  test("pruning arithmetic: an x-slab touches a bounded fraction of units") {
    val units = Q24ZOrder.run(spark, TestSpark.sf001).collect()
      .map(r => (r.getInt(2), r.getInt(3))) // (min_x, max_x)
    val total = units.length
    // Predicate x ∈ one 16-wide grid slab: only units whose x-tile matches
    // can contain rows — at most 16 of the 256 possible units (the y-axis
    // tiles), vs ALL units under a y-sorted layout. This is the file-skip
    // the operator buys.
    val slabLo = 0; val slabHi = 15
    val touched = units.count { case (lo, hi) => hi >= slabLo && lo <= slabHi }
    info(s"x-slab [0,15] touches $touched of $total units")
    assert(touched <= 16, s"x-slab touched $touched units — z-locality broken")
    assert(touched < total, "slab touched every unit — no pruning at all")
  }
}
