package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** p9's value is the COMPOSITION — stage boundaries and survivor plumbing —
  * so these tests pin the cross-stage contracts the hash gate can't
  * localize: membership (exactly p4's sampled survivors, minus
  * fully-stripped docs), count algebra (clean = raw − dropped, token
  * conservation through chunk spans), and the strip-scope rule (spans
  * found within the KEPT corpus, so p9's drops can differ from p7's
  * raw-corpus drops only downward).
  */
class ReleaseManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sweep(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  test("manifest = p4's membership minus fully-stripped docs; count algebra holds") {
    val p9 = P9ReleaseManifest.run(spark, TestSpark.sf0001).collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    sweep()
    val p4 = P4TrainingCorpus.run(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> raw n_tokens
    sweep()
    assert(p9.nonEmpty)
    // same sampled-survivor universe, except docs stripped to nothing
    assert(p9.keySet.subsetOf(p4.keySet))
    p9.foreach { case (id, (_, raw, dropped, clean, _, _, off)) =>
      assert(raw == p4(id), s"doc $id: raw count drifted from p4's")
      assert(clean == raw - dropped && clean > 0, s"doc $id: count algebra")
      assert(off >= 0 && off < P2SequencePack.seqLen)
    }
    val vanished = p4.keySet -- p9.keySet
    // REAL invariant: a doc sampled by p4 goes missing from p9's manifest
    // iff the KEPT-corpus strip leaves it zero clean tokens — recompute the
    // strip over the same kept set p9 uses and check n_tokens == n_dropped
    // for every vanished id (and for no surviving id).
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
    val kept = P1CleanCorpus.runOn(spark, docs)
      .filter(col("status") === "kept").select(col("doc_id"))
    val keptStrip = P7SpanStrip.stripOn(
      docs.join(kept, "doc_id").select(col("doc_id"), col("text")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) - r.getLong(2))).toMap
    sweep()
    vanished.foreach { id =>
      assert(keptStrip(id) == 0L,
        s"doc $id vanished from p9 but kept-corpus strip leaves ${keptStrip(id)} tokens")
    }
    p9.keys.foreach { id =>
      assert(keptStrip(id) > 0L, s"doc $id survived p9 with zero clean tokens")
    }
    // token conservation: total packed tokens == sum of clean counts, and
    // the global chunk stream is dense (max end_chunk == ceil(total/seqLen) - 1)
    val total = p9.values.map(_._4).sum
    val rows = P9ReleaseManifest.run(spark, TestSpark.sf0001)
      .agg(sum(col("n_tokens")), max(col("end_chunk"))).collect()(0)
    sweep()
    assert(rows.getLong(0) == total)
    assert(rows.getLong(1) == (total - 1) / P2SequencePack.seqLen)
  }

  test("strip scope: p9 drops spans of the KEPT corpus — per-doc drops never exceed p7's raw-corpus drops ... within kept docs") {
    val raw = P7SpanStrip.run(spark, TestSpark.sf0001)
      .select("doc_id", "n_dropped").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sweep()
    val p9 = P9ReleaseManifest.run(spark, TestSpark.sf0001)
      .select("doc_id", "n_dropped").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sweep()
    // removing docs from the corpus can only remove gram occurrences, so a
    // gram duplicated among survivors was duplicated in the raw corpus too:
    // kept-scope coverage ⊆ raw-scope coverage, per doc.
    p9.foreach { case (id, d) =>
      assert(d <= raw(id), s"doc $id: kept-scope strip ($d) exceeds raw-scope (${raw(id)})")
    }
    // and the scopes genuinely differ somewhere at this SF, or the test is
    // vacuous (a raw-corpus duplicate pair where one side was dropped)
    info(s"docs with smaller kept-scope drops: ${p9.count { case (id, d) => d < raw(id) }}")
  }
}
