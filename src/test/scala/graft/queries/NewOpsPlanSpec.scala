package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-shape pins for the round-7 operators — the same discipline as
  * PlanSpec: the property that makes each plan survive a 100× scale-up is
  * asserted, so a refactor can't silently regress it.
  */
class NewOpsPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(q: GraftQuery): String = {
    val p = q.run(spark, TestSpark.sf0001).queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    p
  }

  test("d17/t18: shingle self-joins stay key joins — no cartesian, no nested loop") {
    for (q <- Seq(D17Containment, T18SourceOverlap)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"${q.name} pair generation degenerated to O(n^2):\n$p")
    }
  }

  test("g3/g4: the full bucketed-pairs + graph chain contains no O(n^2) join") {
    // g3 (PageRank) has no cross at all; g4's census keeps exactly one
    // BroadcastNestedLoopJoin — the final 1-row stats × 1-row triangle
    // count cross (bounded by construction, same as g2's pinned shape).
    val p3 = plan(G3PageRankLsh)
    assert(!p3.contains("CartesianProduct") && !p3.contains("BroadcastNestedLoopJoin"),
      s"g3 has a non-keyed join:\n$p3")
    val p4 = plan(G4TrianglesLsh)
    assert(!p4.contains("CartesianProduct"), s"g4 has a cartesian:\n$p4")
    val bnlj = p4.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj == 1, s"g4 should have exactly the 1-row census cross, got $bnlj:\n$p4")
  }

  test("t19: every window is partition-local (rank never funnels through one task)") {
    val p = plan(T19LmFilter)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the rank window in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("__pid"),
        s"unpartitioned window (single-partition global sort at scale): $l")
    }
  }

  test("s10: shortlist stage is TakeOrdered (no global sort), query side broadcast") {
    // run()'s output is the driver greedy fold (a LocalTableScan by
    // design — the A4 master-fold budget); the distributed phase to pin is
    // the shortlist stage itself.
    val p = S10MmrSelect.shortlistFrame(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"shortlist materializes a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"1-row query side not broadcast:\n$p")
  }

  test("p6: quota fill windows by source, weight/total joins broadcast") {
    val p = plan(P6TemperatureMix)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("source")),
      s"per-source rank window not keyed on source:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"weights join not broadcast:\n$p")
  }

  test("q24: extent is a broadcast 1-row dimension, unit stats partial-aggregate") {
    // The grid binning must read the extent through one broadcast of a 1-row
    // aggregate (never a shuffle keyed on nothing), and the unit stats must
    // map-side combine (partial_count/min/max before the exchange) — the
    // two properties that keep the layout op scan-bound at 100 TB.
    val p = plan(Q24ZOrder)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"extent not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"extent join degenerated:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"unit stats not partially aggregated:\n$p")
  }

  test("k4: training aggregate and scoring are scan-bound — no join, no window") {
    // k4's whole cost model is "6 scans of a columnar projection": any join
    // or window appearing in the scoring plan means a regression from the
    // O(dims)-to-driver shape the scaladoc promises. (The broadcast-free
    // claim is per-stage: scoring carries the weights as LITERALS.)
    val p = plan(K4QualityClassifier)
    assert(!p.contains("Join"), s"k4 scoring acquired a join:\n$p")
    assert(!p.contains("windowspecdefinition"), s"k4 scoring acquired a window:\n$p")
  }

  test("q25: the merge is ONE keyed join — full-outer shuffle join, nothing nested-loop") {
    // SnapshotMerge's cost model is a single key-partitioned join of the
    // two snapshots; a cartesian or nested-loop appearing here means the
    // disposition logic leaked into the join condition. (FullOuter cannot
    // broadcast, so the keyed form is specifically SortMergeJoin /
    // ShuffledHashJoin.)
    val p = plan(Q25SnapshotMerge)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q25 merge degenerated to a non-keyed join:\n$p")
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"q25 should be exactly one keyed merge join, got $joins:\n$p")
    assert(p.contains("FullOuter"), s"merge lost its full-outer semantics:\n$p")
  }

  test("q26: unpivot is one Expand over the scan — no shuffle, no join") {
    val p = plan(Q26Unpivot)
    assert(p.contains("Expand"), s"unpivot lost its Expand plan:\n$p")
    assert(!p.contains("Exchange"), s"q26 melt acquired a shuffle:\n$p")
    assert(!p.contains("Join"), s"q26 melt acquired a join:\n$p")
  }

  test("p9: the composed release chain contains no cartesian / nested-loop join") {
    // p9 = p1 ∘ d18-strip ∘ p3 ∘ p2 plus doc_id-keyed stage-boundary joins;
    // nothing in the composition may degenerate to a non-keyed pair join.
    val p = plan(P9ReleaseManifest)
    assert(!p.contains("CartesianProduct"), s"p9 has a cartesian:\n$p")
    // The only nested loops allowed are p3's 1-row quota-aggregate crosses
    // (budget n, total weight, p6's pinned shape) — and `samp` feeds BOTH
    // the packing input and the manifest join, so its subplan (with those
    // crosses inside) is duplicated into two consumers: measured 6 at head,
    // all 1-row broadcasts. Pin a ceiling that a genuinely unbounded pair
    // join (corpus × corpus would add at least one per stage) still trips.
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 8, s"p9 grew unbounded nested-loop joins ($bnlj):\n$p")
  }

  test("q27: the CDC merge stays ONE keyed full-outer join — presence flags ride it free") {
    // mergeCdc adds tombstone + per-column presence logic to q25's shape;
    // all of it must stay projection-side — the join itself is still the
    // single key-partitioned full-outer of the two snapshots.
    val p = plan(Q27CdcMergeFull)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q27 merge degenerated to a non-keyed join:\n$p")
    val joins = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"q27 should be exactly one keyed merge join, got $joins:\n$p")
    assert(p.contains("FullOuter"), s"q27 lost its full-outer semantics:\n$p")
  }

  test("p10: the PII-differentiated release keeps p9's join discipline") {
    // p10 = p9's chain + a per-row inject/redact projection; the extra
    // stage must add ZERO joins — same cartesian/nested-loop bounds as p9.
    val p = plan(P10ReleasePii)
    assert(!p.contains("CartesianProduct"), s"p10 has a cartesian:\n$p")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 8, s"p10 grew unbounded nested-loop joins ($bnlj):\n$p")
  }

  test("t22: the rule gate is a pure projection — no shuffle, no join") {
    val p = plan(T22GopherRules)
    assert(!p.contains("Exchange"), s"t22 acquired a shuffle:\n$p")
    assert(!p.contains("Join"), s"t22 acquired a join:\n$p")
  }

  test("t23: drift is one token aggregate + broadcast 1-row dims + TakeOrdered") {
    // the two global aggregates (totals, js sum) must come back as 1-row
    // BROADCAST dimensions, never a shuffled join; the top-10 must be
    // TakeOrdered (no global sort of the vocabulary).
    val p = plan(T23CorpusDrift)
    assert(!p.contains("CartesianProduct"), s"t23 has a cartesian:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"t23's 1-row dimensions degenerated to shuffled joins:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"t23 lost its TakeOrdered top-10:\n$p")
  }

  test("t24: registers are a partial-aggregated max (the sketch merge); comparator join broadcasts") {
    // The scale claim IS the plan shape: each partition's local registers
    // are a complete sub-sketch merged map-side (partial_max before the
    // exchange), and the per-source exact comparator — bounded rows —
    // comes back over a broadcast join, never a shuffled one.
    val p = plan(T24HllCardinality)
    assert(p.contains("partial_max"),
      s"t24 lost its map-side register combine (the sketch merge):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"t24 degenerated to a non-keyed join:\n$p")
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"t24's comparator join must broadcast:\n$p")
  }

  test("p13: the split manifest is one scan + one bounded keyed aggregate — no join at all") {
    // The whole point of the hash-threshold design is that assignment needs
    // no other row: the plan must be projection → partial/final aggregate,
    // with no join of any kind and exactly one shuffle.
    val p = plan(P13SplitManifest)
    assert(!p.contains("Join"), s"p13 acquired a join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"p13 should shuffle exactly once (the (split,source) aggregate), got $exchanges:\n$p")
  }

  test("m7: decode+hash stay in the scan; survivor collapse is groupBy + keyed rejoin, no window") {
    // The payload must never cross an exchange — the mapPartitions decode
    // emits (doc_id, phash); the collapse is a map-side-combinable
    // groupBy(phash) + a phash-keyed rejoin. NO full-partition window (a
    // 16-bit-keyed window puts a whole bucket in one task at scale). The
    // rejoin costs exactly one extra exchange on the same key — assert
    // that's the ONLY one added (2 total), and the join is keyed.
    val p = plan(M7ImagePhash)
    assert(!p.contains("Window"), s"m7 kept a full-partition survivor window:\n$p")
    assert(p.contains("Join"), s"m7 lost its survivor rejoin:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m7's rejoin degenerated to a non-keyed join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2,
      s"m7 should shuffle exactly twice (probe + partial-agg, both on phash), got $exchanges:\n$p")
  }

  test("k6: calibration is k4's scan plus one bounded aggregate — no join beyond k4's own shape") {
    // k4's scoring is scan-bound (no join, pinned above in its own test);
    // k6 may add only the <=10-key decile aggregate on top.
    val p = plan(K6Calibration)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"k6 degenerated to a non-keyed join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"k6 acquired a shuffled join:\n$p")
  }

  test("p12: the funnel adds only keyed stage joins — p9's cartesian/nested-loop discipline") {
    // p12 composes p1 + d9 + p7-strip + p3 and then seven 1-row stage
    // aggregates; the only nested loops allowed are p3's bounded 1-row
    // quota crosses (p9's pinned pattern). A corpus-shaped pair join
    // appearing anywhere in the chain trips the ceiling.
    val p = plan(P12AttritionFunnel)
    assert(!p.contains("CartesianProduct"), s"p12 has a cartesian:\n$p")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 4, s"p12 grew unbounded nested-loop joins ($bnlj):\n$p")
  }

  test("m8: decode+envelope stay in the scan; survivor collapse is groupBy + keyed rejoin, no window") {
    // m7's pin applied to the audio leg: payloads never cross an exchange —
    // the mapPartitions decode emits (doc_id, 16-bit envelope); collapse =
    // groupBy(env_hash) + keyed rejoin, 2 exchanges total, no window.
    val p = plan(M8AudioEnvelope)
    assert(!p.contains("Window"), s"m8 kept a full-partition survivor window:\n$p")
    assert(p.contains("Join"), s"m8 lost its survivor rejoin:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"m8's rejoin degenerated to a non-keyed join:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 2,
      s"m8 should shuffle exactly twice (probe + partial-agg, both on env_hash), got $exchanges:\n$p")
  }

  test("k8: the DSIR model is BROADCAST into the scoring scan — no shuffled data-sized join") {
    // The B-row (256) bucket-ratio frame must reach the gram scan as a
    // broadcast; a shuffled join would re-exchange the whole gram
    // occurrence frame against a 256-row model. The only shuffles allowed
    // are the two map-side-combined aggregates (bucket counts, per-doc sum).
    val p = plan(K8DsirWeights)
    assert(p.contains("BroadcastHashJoin"), s"k8's model join is not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"k8 acquired a shuffled join:\n$p")
    assert(!p.contains("CartesianProduct"), s"k8 has a cartesian:\n$p")
  }

  test("s12: the weighted sample is TakeOrdered over k4's scan — no global sort, no join") {
    // k4's scoring is scan-bound (pinned above); the A-ES selection may add
    // only a projection and a top-n. A Sort node or any join means the
    // sample stopped being O(n) + O(n log k).
    val p = plan(S12PropensitySample)
    assert(p.contains("TakeOrderedAndProject"), s"s12 lost its top-n:\n$p")
    assert(!p.contains("Join"), s"s12 acquired a join:\n$p")
  }

  test("k7: 1-row threshold broadcast + TakeOrdered — the labeling queue adds no data-sized work") {
    // The sweep argmax is a 1-row frame crossed in via broadcast (the
    // bounded-cross pattern); the selection is TakeOrdered. Any cartesian
    // or a second nested loop means the composition leaked a data-sized
    // join.
    val p = plan(K7UncertaintySample)
    assert(p.contains("TakeOrderedAndProject"), s"k7 lost its top-n:\n$p")
    assert(!p.contains("CartesianProduct"), s"k7 has a cartesian:\n$p")
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj == 1, s"k7 should have exactly the 1-row threshold cross, got $bnlj:\n$p")
  }

  test("p15: the batch window is sharded — no unpartitioned window anywhere in the chain") {
    // The length-bucket window must be keyed on (bucket, shard): a bucket
    // is a length-class and can hold most of a corpus, so an unsharded
    // window key is the single-task funnel at scale.
    val p = plan(P15LengthBatches)
    assert(!p.contains("CartesianProduct"), s"p15 has a cartesian:\n$p")
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.exists(l => l.contains("bucket") && l.contains("shard")),
      s"batch window not keyed on (bucket, shard):\n$p")
    assert(windowLines.forall(l =>
      l.contains("shard") || l.contains("__pid") || l.contains("doc_id")),
      s"unpartitioned window in the p15 chain:\n${windowLines.mkString("\n")}")
  }

  test("p16: positions come from the distributed Rank — __pid windows + broadcast offsets") {
    // Every window must be partition-local (t19's pin) and the O(P) offset
    // table must enter via a broadcast hash join, never a when-chain or a
    // shuffled join — the two properties that let the permutation scale to
    // billions of chunks.
    val p = plan(P16EpochShuffle)
    val windowLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, s"expected the rank windows in:\n$p")
    windowLines.foreach { l =>
      assert(l.contains("__pid"), s"unpartitioned window (global sort at scale): $l")
    }
    assert(p.contains("BroadcastHashJoin"), s"offsets not broadcast-joined:\n$p")
    assert(!p.contains("CartesianProduct"), s"p16 has a cartesian:\n$p")
  }
}
