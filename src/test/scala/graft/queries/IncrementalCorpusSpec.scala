package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable

/** p11 (incremental corpus cycle): the oracle pins the composed result;
  * these tests pin the SEAM — the merge's membership algebra feeding the
  * clean stage, and that updated documents are cleaned on their NEW text.
  */
class IncrementalCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("membership algebra: tombstones gone, inserts present, carve-out branches massed") {
    val hs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        Portable.hash60(concat(lit("inc:"), col("doc_id").cast("string"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = P11IncrementalCorpus.run(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = hs.collect {
      case (k, h) if (h % 7 != 0 && !(h % 3 == 0 && h % 5 == 0)) ||
        (h % 7 == 0 && h % 3 == 0 && h % 5 != 0) => k
    }.toSet
    assert(out == expected)
    // every merge branch genuinely fires at this SF
    assert(hs.exists { case (_, h) => h % 7 != 0 && h % 3 == 0 && h % 5 == 0 },
      "no in-base tombstone (deleted) mass")
    assert(hs.exists { case (_, h) => h % 7 == 0 && h % 3 == 0 && h % 5 != 0 },
      "no insert mass")
    assert(hs.exists { case (_, h) => h % 7 == 0 && h % 3 == 0 && h % 5 == 0 },
      "no no-op tombstone mass")
  }

  test("updated docs are cleaned on their NEW text (quality reflects the revision suffix)") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"),
        Portable.hash60(concat(lit("inc:"), col("doc_id").cast("string"))).as("h"))
    // recompute the post-merge text's quality independently
    val expectedQ = docs
      .select(col("doc_id"), col("h"),
        round(T2Quality.score(
          when(col("h") % 3 === 0 && col("h") % 5 =!= 0,
            concat(col("text"), lit(" updated revision"))).otherwise(col("text"))), 6)
          .as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val out = P11IncrementalCorpus.run(spark, TestSpark.sf0001)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    var changed = 0
    expectedQ.foreach { case (id, h, q) =>
      out.get(id).foreach { got =>
        assert(got == q, s"doc $id: cleaned quality $got != post-merge text quality $q")
        if (h % 3 == 0 && h % 5 != 0) changed += 1
      }
    }
    assert(changed > 0, "no updated doc survived into the cleaned output")
  }

  test("plan: the merge seam adds no cartesian to p1's chain") {
    val p = P11IncrementalCorpus.run(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"p11 has a cartesian:\n$p")
    assert(p.contains("FullOuter"), s"p11 lost the merge's full-outer seam:\n$p")
  }
}
