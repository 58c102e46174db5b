package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Round-16 optimization pin: the delta-maintained BPE training loop
  * ([[T12BpeMerges.train]] — per-round pair counts updated only from
  * documents containing the merged pair) must be EXACTLY equivalent to the
  * full-recount loop it replaced ([[T12BpeMerges.trainRecountWitness]]):
  * identical merge tables (round, merged, freq — equal freq proves the
  * delta-updated count table equals the full recount at every argmax) and
  * identical final encoded corpora. BpeSpec additionally pins the merge
  * table against an independent Scala reference implementation.
  */
class T12DeltaCountSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def assertSameTraining(docs: org.apache.spark.sql.DataFrame, label: String): Unit = {
    val (m1, e1) = T12BpeMerges.train(spark, docs)
    val (m2, e2) = T12BpeMerges.trainRecountWitness(spark, docs)
    val merges1 = m1.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    val merges2 = m2.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(merges1.toSeq == merges2.toSeq, s"$label: merge-table drift")
    val enc1 = e1.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val enc2 = e2.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(enc1.toSeq == enc2.toSeq, s"$label: encoded-corpus drift")
  }

  test("delta counts equal full recounts on a fixture exercising merge interactions") {
    import spark.implicits._
    // Overlap semantics ("x x x" = one merge), merged symbols re-pairing
    // in later rounds ("a b" then "a b c"), pair-frequency ties, documents
    // untouched by some merges, and a single-token doc with no pairs.
    val docs = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "x x x x"),
      (3L, "a b a b"),
      (4L, "q"),
      (5L, "c a b c a"),
      (6L, "z y z y z")
    ).toDF("doc_id", "text")
    assertSameTraining(docs, "fixture")
  }

  test("delta counts equal full recounts over the sf0.001 corpus") {
    assertSameTraining(Tables.documents(spark, TestSpark.sf001), "sf0.001")
  }
}
