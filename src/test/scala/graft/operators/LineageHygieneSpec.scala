package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lineage hygiene at the reference's REAL iteration budget: the declared
  * DataFrame loops run ≤ 6 rounds, but the reference defaults to 50
  * (`GuaguaConstants.java:35-37`), and a lazy `var df = step(df)` loop at
  * that depth grows its Catalyst plan per round. These tests run a g1-style
  * rank loop for 50 rounds through Lineage.loop and pin:
  *
  *   1. plan size stays CONSTANT under cadence-1 truncation (the analyzed
  *      plan is a fixed-shape step over an RDD scan every round) while the
  *      untruncated loop's plan grows strictly round over round;
  *   2. per-round wall time stays flat — the last ten executed rounds cost
  *      no more than 3× the rounds 6–15 steady state (generous: a plan
  *      embedding 45+ join rounds would blow well past that);
  *   3. the loop's RESULT is identical with and without truncation
  *      (boundaries change execution, never values), and intermediate
  *      boundary RDDs are actually released (≤ 1 persisted at exit).
  */
class LineageHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sweep(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  /** Small fixed graph: a 40-node ring + chords, so every round's join and
    * aggregate do real (but test-cheap) work for 50 rounds.
    */
  private def graph() = {
    import spark.implicits._
    val n = 40L
    val edges = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i + 7) % n))
    }
    val e = edges.toDF("src", "dst")
    val und = e.union(e.select(col("dst"), col("src"))).toDF("src", "dst")
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
    (und.join(deg, "src"), n)
  }

  private def step(adj: org.apache.spark.sql.DataFrame)(
      prev: org.apache.spark.sql.DataFrame) =
    adj.join(prev, adj("src") === prev("id"))
      .groupBy(col("dst"))
      .agg(round(sum(col("pr") / col("deg")), 9).as("mass"))
      .select(col("dst").as("id"),
        round(lit(0.15 / 40) + lit(0.85) * col("mass"), 9).as("pr"))

  test("50 rounds under cadence-1: constant plan size, flat per-round time, bounded cache") {
    val (adj, n) = graph()
    val init = adj.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1.0 / n))
    // snapshot-diff, not a global count: suites share one session and an
    // earlier suite's leftover caches are not this loop's leak
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val rounds = scala.collection.mutable.ArrayBuffer.empty[Lineage.Round]
    val out = Lineage.loop(spark, init, 50, cadence = 1, observer = rounds += _)(step(adj))
    assert(out.count() == n)
    // ≤ 1 boundary RDD persisted at exit (the final one the result reads)
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.size <= 1, s"boundary RDDs leaked: ${mine.size}")
    // the boundary truly severed the RDD object graph: a persist-only
    // boundary short-circuits recomputation but still SHIPS the whole
    // 50-round parent chain in every task, which stack-overflows on
    // deserialization (the flaky mid-suite StackOverflowError this pins
    // against). Depth must be O(one step), not O(rounds).
    def depth(r: org.apache.spark.rdd.RDD[_],
              seen: scala.collection.mutable.Set[Int]): Int =
      if (!seen.add(r.id)) 0
      else 1 + (0 +: r.dependencies.map(d => depth(d.rdd, seen))).max
    val d = depth(out.rdd, scala.collection.mutable.Set.empty[Int])
    assert(d <= 25, s"boundary did not sever lineage: dependency depth $d after 50 rounds")
    sweep()
    // plan size: identical every round (each round = same step over a scan)
    assert(rounds.map(_.planNodes).distinct.size == 1,
      s"plan grew: ${rounds.map(_.planNodes).mkString(",")}")
    // flat wall time: last 10 rounds vs the 6..15 steady-state window.
    // (Round 1-5 carry JIT/codegen warmup, hence the offset window.)
    val steady = rounds.slice(5, 15).map(_.seconds).sum / 10
    val tail = rounds.takeRight(10).map(_.seconds).sum / 10
    assert(tail <= steady * 3 + 0.05,
      s"per-round time not flat: steady=$steady tail=$tail " +
        s"(all: ${rounds.map(r => f"${r.seconds}%.3f").mkString(",")})")
  }

  test("untruncated 50-round plan grows strictly; truncated result is identical") {
    val (adj, n) = graph()
    val init = adj.select(col("src").as("id")).distinct()
      .withColumn("pr", lit(1.0 / n))
    val lazySizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val lazyOut = Lineage.loop(spark, init, 12, cadence = 0,
      observer = r => lazySizes += r.planNodes)(step(adj))
    assert(lazySizes.toSeq.zip(lazySizes.toSeq.tail).forall { case (a, b) => b > a },
      s"lazy plan should grow monotonically: ${lazySizes.mkString(",")}")
    val lazyRows = lazyOut.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    sweep()
    val truncOut = Lineage.loop(spark, init, 12, cadence = 5)(step(adj))
    val truncRows = truncOut.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    sweep()
    assert(lazyRows.toSeq == truncRows.toSeq,
      "truncation changed values (it must only change execution)")
  }

  test("g1's loop accepts the reference 50-round budget through the knobs") {
    import spark.implicits._
    // tiny pair set → the full g1 surface at 50 rounds stays sub-second/round
    val pairs = (0L until 20L).map(i => (i, (i + 1) % 20)).toDF("vec_a", "vec_b")
    val out = graft.queries.G1PageRank
      .runOverPairs(spark, pairs, rounds = 50, truncateEvery = 5)
      .collect()
    sweep()
    assert(out.length == 20)
    // ring graph: symmetric, so PageRank is uniform 1/20 at every node
    out.foreach(r => assert(math.abs(r.getDouble(2) - 0.05) < 1e-6, r.toString))
  }
}
