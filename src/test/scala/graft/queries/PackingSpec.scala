package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{IndependentHash, TestSpark}

/** Pins for the training-assembly operators (p2 packing, p3 mixing, g1
  * centrality) beyond the DuckDB hash gate: plain-Scala reimplementations
  * from the queries' SPECS (independent of the window/prefix-sum machinery
  * the queries use), the scale-knob equality p2's distributed prefix sum
  * must keep under any partitioning, and g1's mass-conservation and
  * node-set invariants.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** (doc_id, n_tokens, start_chunk, end_chunk, start_offset) from a serial
    * reimplementation: order by (md5 hash, doc_id), running cumsum.
    */
  private def packedSerial(): Seq[(Long, Long, Long, Long, Long)] = {
    val L = P2SequencePack.seqLen
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), tokens(r.getString(1)).size.toLong))
      .filter(_._2 > 0)
      .sortBy { case (id, _) => (IndependentHash.md5hash60(s"pack:$id"), id) }
    var cum = 0L
    docs.map { case (id, n) =>
      val start = cum
      cum += n
      (id, n, start / L, (cum - 1) / L, start % L)
    }.toSeq
  }

  test("p2: matches a serial reimplementation of the packing spec") {
    val got = P2SequencePack.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val exp = packedSerial().sortBy(_._1)
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (g, e) => assert(g == e, s"doc ${e._1}: got $g want $e") }
  }

  test("p2: prefix sum is exact under a non-default partition count") {
    val base = P2SequencePack.run(spark, TestSpark.sf0001).collect()
      .map(_.toSeq).sortBy(_.toString)
    for (p <- Seq(1, 3)) {
      val alt = P2SequencePack.run(spark, TestSpark.sf0001, partitions = p).collect()
        .map(_.toSeq).sortBy(_.toString)
      assert(alt.toSeq == base.toSeq, s"partitions=$p changed the packing")
    }
  }

  test("p2: chunk spans are consistent and the stream is gapless") {
    val L = P2SequencePack.seqLen
    val rows = P2SequencePack.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = rows.map(_._1).sum
    assert(rows.forall { case (_, s, e, o) => o >= 0 && o < L && e >= s })
    // A doc's span is exactly what its offset + length dictate.
    assert(rows.forall { case (n, s, e, o) => e - s == (o + n - 1) / L })
    // Last chunk id is the one the total token count dictates — no gaps.
    assert(rows.map(_._3).max == (total - 1) / L)
  }

  test("p14: mass conservation over ENCODED lengths — packed symbols equal t13's, stream gapless") {
    val L = P2SequencePack.seqLen
    // t13 is the length authority: every doc it reports with n_symbols > 0
    // must appear in p14 with exactly that length, and the packed stream
    // must account for every symbol (no gap, no double-count).
    val enc = T13BpeEncode.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = P14BpePack.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSet == enc.filter(_._2 > 0).keySet,
      "p14 packs a different doc set than t13 reports")
    rows.foreach { case (id, n, _, _, _) =>
      assert(n == enc(id), s"doc $id: packed $n symbols, t13 encoded ${enc(id)}")
    }
    val total = rows.map(_._2).sum
    assert(total == enc.values.sum, "packed symbol mass != encoded symbol mass")
    // span consistency + gaplessness (p2's invariants on the encoded stream)
    assert(rows.forall { case (_, n, s, e, o) => o >= 0 && o < L && e - s == (o + n - 1) / L })
    assert(rows.map(_._4).max == (total - 1) / L)
    // and the composition changes the layout vs whitespace packing: the
    // encoded stream is strictly shorter (merges compress), so the packed
    // chunk count drops — the reason p14 exists.
    val wsTotal = P2SequencePack.run(spark, TestSpark.sf0001).collect()
      .map(_.getLong(1)).sum
    assert(total < wsTotal, s"encoded stream ($total) not shorter than whitespace ($wsTotal)")
  }

  test("p3: quotas are filled exactly, ranks dense, budget respected") {
    val rows = P3MixtureSample.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    val weights = docs.map(_._2).distinct
      .map(s => s -> (s.drop(3).toInt % 4 + 1).toLong).toMap
    val tw = weights.values.sum
    val bySource = rows.groupBy(_._1)
    for ((src, w) <- weights) {
      val quota = (n / 2) * w / tw
      val kept = bySource.getOrElse(src, Array.empty)
      assert(kept.length.toLong == quota, s"$src: kept ${kept.length}, quota $quota")
      assert(kept.forall(_._2 == quota))
      assert(kept.map(_._3).sorted.toSeq == (1L to quota), s"$src: ranks not dense")
    }
    assert(rows.length <= n / 2)
    // The fill is hash-rank-first: kept docs are each source's smallest hashes.
    for ((src, kept) <- bySource) {
      val keptIds = kept.map(_._4).toSet
      val ordered = docs.filter(_._2 == src)
        .sortBy { case (id, _) => (IndependentHash.md5hash60(s"mix:$id"), id) }
        .map(_._1)
      assert(ordered.take(keptIds.size).toSet == keptIds, s"$src: not the hash-first prefix")
    }
  }

  test("g1: PageRank conserves mass, covers exactly the d5 pair nodes") {
    val rows = G1PageRank.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 > 0.0))
    // Symmetric graph, no dangling nodes: teleport + damped redistribution
    // preserves total mass 1 (up to the per-round 1e-9 rounding).
    val mass = rows.map(_._3).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"total PageRank mass $mass drifted from 1")
    // Same node universe as d10 (both derive from d5's pair participants).
    val d10Nodes = D10SemanticClusters.run(spark, TestSpark.sf0001).collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == d10Nodes, "g1/d10 node universes diverged")
    // Handshake lemma: undirected degrees sum to twice the d5 pair count.
    val pairCount = D5EmbedDedup.run(spark, TestSpark.sf0001).count()
    assert(rows.map(_._2).sum == 2L * pairCount, "degree sum != 2 × pair count")
  }

  /** p15's serial reimplementation over the encoded corpus: bucket by
    * len div 16, shard by hash, longest-first batches of 8 — independent
    * of the query's window machinery.
    */
  private def batchesSerial(sf: String): Map[(Long, Long, Long), (Long, Long, Long, Long)] = {
    val enc = T12BpeMerges.encodedCorpus(spark, sf)
      .selectExpr("doc_id", "CAST(length(s) AS LONG) AS len").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    enc.groupBy { case (id, len) =>
      (len / 16L, IndependentHash.md5hash60(s"lb:$id") % 4L)
    }.flatMap { case ((bucket, shard), docs) =>
      docs.sortBy { case (id, len) => (-len, id) }
        .grouped(8).zipWithIndex.map { case (batch, bi) =>
          val lens = batch.map(_._2)
          (bucket, shard, bi.toLong) ->
            (batch.size.toLong, lens.max, lens.sum, lens.max * batch.size - lens.sum)
        }
    }
  }

  test("p15: batch table == serial length-bucketed reimplementation (sf0.001)") {
    val got = P15LengthBatches.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got == batchesSerial(TestSpark.sf0001))
  }

  test("p15 invariants: partition of the corpus, size bound, longest-first monotone (sf0.01)") {
    val rows = P15LengthBatches.run(spark, TestSpark.sf001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3), r.getLong(4)))
    val nEncoded = T12BpeMerges.encodedCorpus(spark, TestSpark.sf001).count()
    assert(rows.map(_._3).sum == nEncoded, "batches must partition the encoded corpus")
    assert(rows.forall(_._3 <= 8L), "batch size bound")
    rows.groupBy(_._1).foreach { case (key, bs) =>
      val byBatch = bs.sortBy(_._2)
      // every batch but the LAST is full: the grouped(8) assembly contract
      assert(byBatch.init.forall(_._3 == 8L), s"non-final partial batch in $key")
      // longest-first fill: max_len never increases across consecutive batches
      assert(byBatch.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"max_len not monotone in $key")
    }
  }

  test("p15 earns its keep: bucketed pad waste < naive doc_id-order batching (sf0.01)") {
    val enc = T12BpeMerges.encodedCorpus(spark, TestSpark.sf001)
      .selectExpr("doc_id", "CAST(length(s) AS LONG) AS len").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val naive = enc.sortBy(_._1).grouped(8).map { b =>
      val lens = b.map(_._2); lens.max * b.size - lens.sum
    }.sum
    val bucketed = P15LengthBatches.run(spark, TestSpark.sf001)
      .selectExpr("CAST(sum(pad_waste) AS LONG)").collect().head.getLong(0)
    info(s"pad waste: bucketed $bucketed vs naive doc_id-order $naive")
    assert(bucketed < naive,
      s"length bucketing should beat naive batching: $bucketed >= $naive")
  }
}
