package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The d5/d7 scale knobs (`blocks`, `edgePartitions`) exist so a corpus-scale
  * run is a parameter change, not a code edit. A parameter nobody has ever
  * set is a comment with extra steps — these tests drive each knob at a
  * NON-default value and assert the result is identical to the default run,
  * plus pin the sizing rules' arithmetic.
  */
class ScaleKnobSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Canonical row multiset (both queries round their doubles, so string
    * rendering is stable across partitionings).
    */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val rows = df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // Knob runs persist intermediates; sweep so the next run starts clean.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    rows
  }

  test("d5: blocks = 3 (non-default) yields the identical pair set") {
    val default = canon(D5EmbedDedup.run(spark, TestSpark.sf0001))
    val tuned = canon(D5EmbedDedup.run(spark, TestSpark.sf0001, blocks = 3))
    assert(default.nonEmpty, "fixture produced no similar pairs — test is vacuous")
    assert(tuned == default)
  }

  test("d5: blocks = 1 (single tile, the all-in-memory corner) yields the identical pair set") {
    val default = canon(D5EmbedDedup.run(spark, TestSpark.sf0001))
    val one = canon(D5EmbedDedup.run(spark, TestSpark.sf0001, blocks = 1))
    assert(one == default)
  }

  test("d7: edgePartitions = 2 (non-default) yields the identical components") {
    val default = canon(D7DupClusters.run(spark, TestSpark.sf0001))
    val tuned = canon(D7DupClusters.run(spark, TestSpark.sf0001, edgePartitions = 2))
    assert(default.nonEmpty, "fixture produced no duplicate clusters — test is vacuous")
    assert(tuned == default)
  }

  test("blocksFor: picks the smallest block count whose tile fits the budget") {
    // 1B vectors x 512 B at a 1 GiB tile budget (the scaladoc example).
    assert(D5EmbedDedup.blocksFor(1000000000L, 512L, 1L << 30) == 954)
    // A corpus that already fits one tile needs exactly one block.
    assert(D5EmbedDedup.blocksFor(1000L, 512L, 1L << 30) == 1)
  }

  test("edgePartitionsFor: partitions by edge count, not corpus size") {
    // 1M pairs -> 2M directed edges x 24 B = 48 MB -> one 128 MB partition.
    assert(D7DupClusters.edgePartitionsFor(1000000L) == 1)
    // 100M pairs -> 4.8 GB of edges -> ceil(4.8 GB / 128 MB) = 36.
    assert(D7DupClusters.edgePartitionsFor(100000000L) == 36)
    assert(D7DupClusters.edgePartitionsFor(0L) == 1)
  }
}
