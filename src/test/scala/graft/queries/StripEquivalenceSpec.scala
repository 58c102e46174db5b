package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.TextOps

/** p7's round-10 scale fix: the per-token covered-position probe moved from
  * O(L·C) `array_contains` to an O(log C) binary search over the sorted
  * list ([[org.apache.spark.sql.graft.SortedContains]]). These tests pin
  * that the optimized form computes EXACTLY the old form's output — on the
  * real corpus and on the hostile fixture the fix exists for (a long
  * fully-duplicated document, where C ≈ L made the old probe quadratic).
  */
class StripEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The pre-round-10 reference implementation, verbatim: unsorted
    * collect_list + linear array_contains probe.
    */
  private def stripReference(docs: DataFrame): DataFrame = {
    val k = 10 // ExactSubstr.k
    val cov = ExactSubstr.hitsOn(docs)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(k - 1).cast("long"))).as("tp"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(collect_list(col("tp")).as("cps"), count(lit(1)).as("n_dropped"))
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .join(cov, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        concat_ws(" ",
          filter(col("toks"), (t, i) =>
            !coalesce(array_contains(col("cps"), (i + 1).cast("long")), lit(false))))
          .as("clean_text"))
  }

  private def canon(df: DataFrame) =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("binary-search strip equals the linear-probe reference on the corpus (sf0.001)") {
    val docs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("text"))
    val opt = canon(P7SpanStrip.stripOn(docs))
    val ref = canon(stripReference(docs))
    assert(opt == ref)
    // the corpus exercises both branches: stripped docs and untouched docs
    assert(opt.exists(_._3 > 0) && opt.exists(_._3 == 0L))
  }

  test("hostile fixture: fully-duplicated long doc (C = L) strips identically and completely") {
    import spark.implicits._
    val phrase = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, Seq.fill(8)(phrase).mkString(" ")),  // 240 tokens, all covered
      (2L, Seq.fill(8)(phrase).mkString(" ")),  // its twin
      (3L, (1 to 50).map(i => s"unique$i").mkString(" "))) // untouched
      .toDF("doc_id", "text")
    val opt = canon(P7SpanStrip.stripOn(docs))
    val ref = canon(stripReference(docs))
    assert(opt == ref)
    val d1 = opt.find(_._1 == 1L).get
    assert(d1._2 == 240L && d1._3 == 240L && d1._4 == "",
      s"fully-duplicated doc must strip to empty: $d1")
    val d3 = opt.find(_._1 == 3L).get
    assert(d3._3 == 0L && d3._4.nonEmpty)
  }
}
