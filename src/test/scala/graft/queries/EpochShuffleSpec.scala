package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{IndependentHash, TestSpark}

/** Pins for p16 beyond the DuckDB hash gate: each epoch is a BIJECTION
  * chunk-set → 1..N (the property a resumable loader depends on — position
  * k names exactly one sequence), the order equals a serial hash-sort
  * replay (so the distributed Rank assembly adds nothing to the
  * semantics), and the two epochs genuinely decorrelate (the reason the
  * epoch seed is in the hash input at all).
  */
class EpochShuffleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def permutations(sf: String): Map[Long, Seq[(Long, Long)]] =
    P16EpochShuffle.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (e, rows) => e -> rows.map(r => (r._2, r._3)).toSeq }

  test("p16: each epoch is a bijection over p14's chunk universe (sf0.001)") {
    val maxChunk = P14BpePack.run(spark, TestSpark.sf0001)
      .selectExpr("max(end_chunk)").collect().head.getLong(0)
    val perms = permutations(TestSpark.sf0001)
    assert(perms.keySet == Set(0L, 1L))
    perms.foreach { case (e, rows) =>
      assert(rows.map(_._1).sorted == (0L to maxChunk), s"epoch $e chunk set wrong")
      assert(rows.map(_._2).sorted == (1L to maxChunk + 1), s"epoch $e positions not 1..N")
    }
  }

  test("p16: order == serial hash-sort replay per epoch (sf0.001)") {
    val perms = permutations(TestSpark.sf0001)
    perms.foreach { case (e, rows) =>
      val chunks = rows.map(_._1)
      val want = chunks.sortBy(c => (IndependentHash.md5hash60(s"ep:$e:$c"), c))
        .zipWithIndex.map { case (c, i) => (c, i + 1L) }.toMap
      assert(rows.toMap == want, s"epoch $e diverged from the serial replay")
    }
  }

  test("p16: epochs decorrelate — almost no fixed points between epoch orders") {
    val perms = permutations(TestSpark.sf0001)
    val p0 = perms(0L).toMap
    val p1 = perms(1L).toMap
    val n = p0.size
    val fixed = p0.count { case (c, pos) => p1(c) == pos }
    info(s"fixed points between epochs: $fixed of $n")
    assert(fixed < n / 4,
      s"epoch orders too correlated: $fixed of $n chunks kept their position")
  }

  test("p16: an EMPTY pack table yields an empty schedule, not an NPE") {
    import org.apache.spark.sql.functions._
    val emptyPack = spark.range(0).select(col("id").as("end_chunk"))
    val out = P16EpochShuffle.schedule(spark, emptyPack)
    assert(out.columns.toSeq == Seq("epoch", "chunk", "position"))
    assert(out.count() == 0)
  }
}
