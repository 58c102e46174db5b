package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for t27 beyond the DuckDB gate: the serial replay (counts + total
  * order + coverage recomputed in plain Scala), the curve's theorems
  * (coverage monotone non-decreasing in budget, OOV non-increasing,
  * exhaustion at budget ≥ |vocab|), and the rank plan staying distributed.
  */
class VocabCoverageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("t27 == serial replay (sf0.001), and the curve's theorems hold") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("text").collect().map(_.getString(0))
    val freq = docs.flatMap(tokens).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ranked = freq.toSeq.sortBy { case (tok, f) => (-f, tok) }
    val total = freq.values.sum
    val want = T27VocabCoverage.budgets.map { b =>
      val head = ranked.take(b.toInt)
      val covered = head.map(_._2).sum
      val oov = math.round((1.0 - covered.toDouble / total.toDouble) * 1e9)
      (b, head.size.toLong, covered, total, oov)
    }
    val got = T27VocabCoverage.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // theorems: coverage monotone, oov anti-monotone, exhaustion at the tail
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 <= b._3 && a._5 >= b._5, s"curve not monotone: $a -> $b")
    }
    val vocabSize = freq.size.toLong
    got.filter(_._1 >= vocabSize).foreach { row =>
      assert(row._2 == vocabSize && row._3 == total && row._5 == 0L,
        s"budget ${row._1} >= |vocab| $vocabSize must exhaust: $row")
    }
    assert(got.exists(_._1 >= vocabSize), "no budget exhausts the fixture vocab — endpoint pin vacuous")
  }

  test("t27 plan: the vocabulary rank is distributed (__pid-local windows only)") {
    val df = T27VocabCoverage.run(spark, TestSpark.sf0001)
    val p = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the rank window in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("__pid"),
        s"unpartitioned window (single-partition global vocab sort at scale): $l")
    }
  }
}
