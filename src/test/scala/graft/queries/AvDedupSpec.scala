package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for m9 beyond the DuckDB gate: the composite collapse is a strict
  * REFINEMENT of each single-modality collapse (every m9 group sits inside
  * one m4 group and one m8 group — so per doc, m9's match_count never
  * exceeds either modality's), and the fusion genuinely discriminates on
  * the driver corpus (some pair collides in one modality but not both).
  */
class AvDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("m9 refines m4 AND m8; fusion discriminates on the real corpus (sf0.001)") {
    val m4 = M4VideoDedup.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val m8 = M8AudioEnvelope.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getLong(2))).toMap // (n_same, survivor)
    val m9 = M9AvDedup.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // coverage: m9 = docs present in both modality frames
    assert(m9.keySet == (m4.keySet intersect m8.keySet))
    // refinement: composite count <= each modality's count, per doc
    m9.foreach { case (id, (c, _)) =>
      assert(c <= m4(id)._1, s"doc $id: composite $c > video ${m4(id)._1}")
      assert(c <= m8(id)._1, s"doc $id: composite $c > audio ${m8(id)._1}")
    }
    // canonical consistency: a doc that is its own composite canonical has
    // the smallest id among docs sharing BOTH fingerprints — replay check
    // via group reconstruction
    val byGroup = m9.groupBy(_._2._2)
    byGroup.foreach { case (canon, members) =>
      assert(members.keys.min == canon,
        s"composite canonical $canon is not the min id of its group")
      assert(members.values.forall(_._1 == members.size.toLong),
        s"composite group of $canon disagrees on its own size")
    }
    // honest corpus fact, pinned so a fixture change is noticed: both
    // fingerprints derive from the same bytes here, so the video signature
    // refines the audio envelope EVERYWHERE and composite == video count
    m9.foreach { case (id, (c, _)) =>
      assert(c == m4(id)._1,
        s"doc $id: composite $c != video ${m4(id)._1} — the corpus now exercises" +
          " cross-modality splits; tighten this pin to the synthetic case's form")
    }
  }

  test("fusion discriminates: same video + different audio do NOT collapse (synthetic)") {
    import spark.implicits._
    // docs 1,2: identical video sig; 1,3: identical audio envelope; only a
    // pair agreeing on BOTH may collapse — here nothing does, while each
    // single modality would have collapsed a pair.
    val j = Seq(
      (1L, Seq(5L, 9L), 17L),
      (2L, Seq(5L, 9L), 23L), // video collides with 1, audio differs
      (3L, Seq(7L, 7L), 17L), // audio collides with 1, video differs
      (4L, Seq(5L, 9L), 23L)  // collides with 2 on BOTH -> true composite dup
    ).toDF("doc_id", "sig", "env_hash")
    val got = M9AvDedup.collapseOn(j)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((1L, 1L)), s"video-only collision collapsed: ${got(1L)}")
    assert(got(3L) == ((1L, 3L)), s"audio-only collision collapsed: ${got(3L)}")
    assert(got(2L) == ((2L, 2L)) && got(4L) == ((2L, 2L)),
      s"both-modality duplicates must collapse: ${got(2L)} / ${got(4L)}")
  }
}
