package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Physical-plan shape assertions — the properties that make these plans
  * survive a 100× scale-up are pinned here so a refactor can't silently
  * regress them (scan pruning, filter pushdown, broadcast vs shuffle joins,
  * top-k without global sort, codegen coverage, shuffle reuse).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: GraftQuery): String =
    q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString

  test("q1: scan is pruned to the two referenced columns") {
    val p = plan(Q1Agg)
    assert(p.contains("ReadSchema"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q7: partial+final hash aggregation (map-side combine before the shuffle)") {
    val p = plan(Q7GroupedAgg)
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("partial"),
      "no partial aggregation — every row would cross the shuffle")
  }

  test("q8's source filter is pushed into the parquet scan") {
    import org.apache.spark.sql.functions._
    // Inspect the pre-sink plan (q8 itself returns the round-tripped read).
    val df = graft.Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_shipdate") >= lit("1995-06-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed down:\n$p")
  }

  test("j1: fixed-size dimension joins by broadcast, no shuffle of nation") {
    val p = plan(J1JoinRevenue)
    assert(p.contains("BroadcastHashJoin"), "nation should broadcast-join")
  }

  test("j2: top-k plans as TakeOrderedAndProject (no global sort materialized)") {
    val p = plan(J2TopK)
    assert(p.contains("TakeOrderedAndProject"), s"global sort materialized:\n$p")
  }

  test("q5: assignment+aggregation runs inside WholeStageCodegen (no UDF breaks)") {
    // AQE reports codegen spans only once the plan is final — materialize first.
    val df = Q5KMeansAssign.run(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the simple format.
    assert(p.contains("*(") && p.linesIterator.exists(l =>
      l.contains("*(") && l.contains("HashAggregate")),
      s"aggregation not codegen'd:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "non-codegen evaluation in the hot path")
  }

  test("d2: band-bucket self-join is a key join, not a nested-loop/cartesian") {
    val p = plan(D2MinhashLsh)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH join degenerated to O(n^2):\n$p")
  }

  test("w2: window and groupBy share one hash-partitioning (single exchange on user_id)") {
    val p = plan(W2Sessions)
    val exchanges = p.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 user_id exchange, got $exchanges:\n$p")
  }

  test("t3/t4: document projections are shuffle-free (scan-bound)") {
    for (q <- Seq(T3TokenCount, T4Fingerprint)) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"${q.name} shuffles a pure projection:\n$p")
    }
  }

  test("s4: centroid assignment broadcasts the 16-row dimension; no cartesian anywhere") {
    val p = plan(S4AnnIvf)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"centroid set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"IVF degenerated to a cartesian:\n$p")
  }

  test("s2: multi-probe LSH joins on (table, bucket) keys, never all-pairs") {
    val p = plan(S2AnnLsh)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate join degenerated to O(n^2):\n$p")
  }

  test("d4: the hashed-shingle frame is computed once and read from cache by both consumers") {
    val p = plan(D4NgramJaccard)
    val cacheReads = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(cacheReads >= 2,
      s"expected both the LSH and verify stages to read the persisted shingle frame, " +
        s"got $cacheReads InMemoryTableScan(s):\n$p")
  }

  test("t7/m2/t11: fingerprint, frame-sample and char-entropy are shuffle-free pipelines") {
    for (q <- Seq(T7RollingFingerprint, M2FrameSample, T11CharEntropy)) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"${q.name} shuffles a pure per-row pipeline:\n$p")
    }
  }

  test("d8: the Bloom word table broadcasts; the probe side never shuffles by word") {
    val p = plan(D8BloomDedup)
    assert(p.contains("BroadcastHashJoin"), s"bloom word table not broadcast:\n$p")
    // Exactly one word-keyed exchange is legitimate: the BUILD side's
    // m/32-row bit_or combine. A second would mean the probe (100 TB) side
    // was hash-partitioned by word, i.e. the join stopped broadcasting.
    val wordExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning(word"))
    assert(wordExchanges <= 1, s"probe side shuffled by word:\n$p")
    assert(p.contains("BroadcastExchange"), s"no broadcast of the word table:\n$p")
  }

  test("t9: LM scoring joins on n-gram keys, never all-pairs") {
    val p = plan(T9BigramLm)
    assert(!p.contains("CartesianProduct"), s"LM join degenerated:\n$p")
  }

  test("s6: trained-IVF assignment broadcasts the centroid set each pass; partial-aggregated counts") {
    val p = plan(S6AnnIvfTrained)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"trained centroid set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"trained assignment degenerated to a cartesian:\n$p")
    assert(p.contains("HashAggregate") && p.contains("partial"),
      s"per-list counts not map-side combined:\n$p")
  }

  test("t10: tf/df joins are key joins; the only nested-loop is the broadcast 1-row corpus count") {
    val p = plan(T10TfIdf)
    assert(!p.contains("CartesianProduct"), s"TF-IDF join degenerated:\n$p")
    val nested = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(nested <= 1, s"expected at most the 1-row N broadcast, got $nested nested-loop joins:\n$p")
    // Per-doc ranking must shuffle on doc_id (bounded per-doc lists), never
    // sort globally.
    assert(!p.linesIterator.exists(l => l.contains("Sort ") && l.contains("global=true")),
      s"global sort materialized for per-doc ranking:\n$p")
  }

  test("d5: tiled pair mining is a grouped fold, never a join over vector pairs") {
    // The scale guarantee d10 inherits for its stage 1: no join operator at
    // all — pairs come from per-tile in-memory loops after a keyed exchange.
    val p = plan(D5EmbedDedup)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"d5 should have no join operator (tiled groupByKey shape):\n$p")
    assert(p.contains("Exchange hashpartitioning"),
      s"tiles should be distributed by a keyed exchange:\n$p")
  }

  test("w6: both windows and the per-user agg share one user_id exchange") {
    val p = plan(W6Funnel)
    val userExchanges = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges == 1,
      s"expected one user_id exchange feeding windows+agg, got $userExchanges:\n$p")
  }

  test("p1: exact dedup is groupBy + content-hash-keyed rejoin — bounded tasks, no cartesian") {
    val p = plan(P1CleanCorpus)
    // Stage 2 must NOT plan as a hash-partitioned Window: a window keyed
    // on md5(text) puts each duplicate FAMILY in one task, and web corpora
    // have families with millions of copies. The scale-safe shape is a
    // map-side-combinable groupBy on the content hash + an md5-keyed
    // rejoin (per-task state bounded under any family mass; the join
    // streams the probe side).
    assert(p.contains("md5(cast(text"),
      s"exact-dedup stage no longer keys on the content hash:\n$p")
    assert(p.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning(__h")),
      s"exact-dedup stage lost its content-hash partitioning:\n$p")
    assert(p.contains("HashAggregate"),
      s"exact-dedup stage lost its map-side-combinable aggregate:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pipeline degenerated to O(n^2) somewhere:\n$p")
  }

  test("p2: every window is range-partition-local — no single-partition global sort") {
    val df = P2SequencePack.run(spark, TestSpark.sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // The scale contract: the prefix sum must NOT plan as
    // Window.orderBy(...) over Exchange SinglePartition.
    assert(!p.contains("Exchange SinglePartition") || !p.contains("Window"),
      s"global token cumsum collapsed to a single partition:\n$p")
    assert(p.contains("Exchange rangepartitioning"),
      s"prefix sum lost its range partitioning:\n$p")
  }

  test("p3: corpus size and weights arrive by broadcast; ranking is per-source") {
    val p = plan(P3MixtureSample)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"1-row aggregates not broadcast:\n$p")
    // The only SinglePartition exchanges allowed are the 1-row broadcast
    // aggregates (n, total weight); the ranking window itself must sit on
    // the source-keyed hash partitioning.
    assert(p.contains("Exchange hashpartitioning(source"),
      s"per-source ranking lost its source-keyed partitioning:\n$p")
    assert(!p.contains("CartesianProduct"), s"mixture quota degenerated to cartesian:\n$p")
  }

  test("s7: PQ encode joins the broadcast codebook; no shuffle of vector pairs") {
    val p = plan(S7AnnPq)
    assert(p.contains("BroadcastHashJoin"), s"codebook not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"PQ encode degenerated to O(n^2):\n$p")
  }

  test("w7: both aggregates are map-side combined (partial before the exchange)") {
    val p = plan(W7Retention)
    assert(p.contains("partial"), s"no partial aggregation in retention:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Exchange SinglePartition"),
      s"retention matrix planned a scale-unsafe operator:\n$p")
  }

  test("m3: keyframe pooling partial-aggregates the O(frames) feature rows; payload never shuffles") {
    val p = plan(M3KeyframePool)
    // The pooling aggregate must combine map-side: only ~1 row per video per
    // partition crosses the exchange, and the argmax rides the same
    // aggregate (a struct max), not a separate window pass.
    assert(p.contains("partial"), s"no partial aggregation in keyframe pooling:\n$p")
    assert(!p.contains("Window"), s"keyframe argmax planned a window pass:\n$p")
    // The binary payload exists only below the flatMap — after it, rows are
    // (doc_id, frame_idx, n_resized, score); no payload column may appear in
    // any exchange.
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("payload"), s"payload crosses a shuffle:\n$exchanges")
    assert(!p.contains("CartesianProduct") && !p.contains("Exchange SinglePartition"),
      s"keyframe pooling planned a scale-unsafe operator:\n$p")
  }

  test("s8: trained-index search broadcasts both tiny sides (centroids, probes); no cartesian beyond them") {
    val p = plan(S8AnnIvfSearch)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"no broadcast join in the trained search path:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"trained search planned a shuffled cartesian:\n$p")
  }

  test("t15: sketch build and point queries are partial-aggregated; sketch side broadcasts") {
    val p = plan(T15CountMin)
    assert(p.contains("partial"), s"sketch cells lost map-side combine:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k tokens materialized a global sort:\n$p")
    assert(!p.contains("CartesianProduct"), s"sketch probe planned a cartesian:\n$p")
  }

  test("w8: transition matrix shares one user_id exchange; counts partial-aggregate") {
    val p = plan(W8Transitions)
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"w8 planned $exchanges exchanges (window + count expected):\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"transition count lost map-side combine:\n$p")
  }

  test("q20: the source predicate prunes partitions at the directory level") {
    val p = plan(Q20PartitionedSink)
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("source"),
      s"source predicate did not become a PartitionFilter:\n$p")
    // Pruned at planning time means the data filter list does NOT carry it
    // as a row-level PushedFilter over file contents.
    assert(p.contains("PartitionFilters: [isnotnull(source"),
      s"partition filter shape unexpected:\n$p")
  }

  test("d11: top-k is a TakeOrdered, winners broadcast to text recovery, counts partial-agg") {
    val p = plan(D11DupSpans)
    assert(p.contains("TakeOrderedAndProject"),
      s"span top-k materialized a global sort instead of TakeOrdered:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the k winning hashes should broadcast into the recovery scan:\n$p")
    assert(p.contains("partial"), s"docs-per-span count lost its map-side combine:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"text recovery planned a shuffle join for a k-row side:\n$p")
  }

  test("v2: probe set broadcasts (base streams); vote is a partial-agg + per-query window") {
    val p = plan(V2KnnLabel)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"probe side should broadcast to the streamed base:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"probe x base planned a shuffled cartesian instead of a broadcast:\n$p")
    assert(p.contains("partial"), s"vote counting lost its map-side combine:\n$p")
  }

  test("w9: gap histogram shares one user_id exchange; bucket counts partial-aggregate") {
    val p = plan(W9InterArrival)
    // window exchange (user_id) + the <=32-key bucket aggregate; the share
    // denominator must broadcast, never a third full shuffle.
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"w9 planned $exchanges exchanges:\n$p")
    assert(p.contains("partial"), s"bucket count lost map-side combine:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"total-gaps denominator did not broadcast:\n$p")
  }

  test("t16: vocab top-N is a TakeOrdered; token counts partial-aggregate; stats broadcast") {
    val p = plan(T16Zipf)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 tokens materialized a global vocabulary sort:\n$p")
    assert(p.contains("partial"), s"token count lost map-side combine:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"OLS stats row did not broadcast:\n$p")
  }

  test("j7: one fact-fact shuffle join at most; dims broadcast; date filter reaches the orders scan") {
    val p = plan(J7StarJoin)
    val shuffleJoins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(shuffleJoins <= 1, s"j7 planned $shuffleJoins shuffle joins (only lineitem><orders may shuffle):\n$p")
    val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 3, s"j7 planned only $bhj broadcast joins for 4 dimension hops:\n$p")
    val pushed = p.linesIterator.find(l => l.contains("PushedFilters") && l.contains("o_orderdate"))
    assert(pushed.isDefined, s"o_orderdate window not pushed to the orders scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the star plan:\n$p")
  }

  test("v2c: candidates come from a list_id equi-join; nested loops only against the 16-row centroid dim") {
    val p = plan(V2cKnnLabelIvf)
    assert(!p.contains("CartesianProduct"), s"v2c planned a cartesian:\n$p")
    // v2's scale limit was the probe-side broadcast feeding a nested-loop
    // join over the WHOLE base; v2c may nested-loop only against the 16-row
    // centroid dimension (which instantiates twice — once under the base
    // branch, once under the probe branch). The candidate join must be a
    // keyed equi-join.
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"v2c planned $bnlj nested-loop joins (only the two centroid broadcasts are allowed):\n$p")
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) &&
        l.contains("probe_list") && l.contains("assigned_list")),
      s"no probe_list=assigned_list equi-join in v2c's plan:\n$p")
  }

  test("d16: candidate generation is a (table,bucket) key join — no d5 tile stage, no all-pairs") {
    // The point of d16 vs d10: pair mining must NOT go through d5's tiled
    // flatMapGroups (O(n²) dot products) nor any nested-loop join. The only
    // acceptable shape is bucket-keyed equi-joins + the exact verify filter.
    val p = D16SemanticLshClusters.verifiedPairs(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("MapGroups") && !p.contains("AppendColumns"),
      s"d16 routed through a typed tile fold (the exact-path shape):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"d16 candidate join degenerated to O(n²):\n$p")
    assert(p.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("bucket")),
      s"no bucket-keyed equi-join found in d16's plan:\n$p")
  }
}
