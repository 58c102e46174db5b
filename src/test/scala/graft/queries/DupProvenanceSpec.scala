package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for d19 beyond the DuckDB gate: serial replay from d4's own pair
  * list, pair-mass conservation (every verified pair lands in exactly one
  * cell), and canonical cell keys (src_a <= src_b always).
  */
class DupProvenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("d19 == serial replay over d4's pairs; mass conserved; cells canonical (sf0.001)") {
    val pairs = D4NgramJaccard.run(spark, TestSpark.sf0001)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val src = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = pairs.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = D19DupProvenance.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got.values.sum == pairs.length.toLong, "a pair vanished or double-counted")
    got.keys.foreach { case (a, b) => assert(a <= b, s"non-canonical cell ($a, $b)") }
    assert(pairs.nonEmpty && got.nonEmpty, "vacuous fixture")
  }
}
