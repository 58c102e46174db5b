package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Portable

/** t22 (Gopher rule gates) and t23 (corpus drift): the oracle pins engine
  * agreement; these tests pin that the fixtures give every rule branch real
  * mass (a gate that always passes is vacuous) and that the drift report
  * matches an independent driver-side recomputation.
  */
class DriftAndRulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("t22: every rule has mass and the verdict cuts both ways on branch combinations") {
    val rows = T22GopherRules.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    // both verdicts populated
    assert(rows.exists(_._7) && rows.exists(!_._7), "keep verdict is vacuous")
    // each structural rule fires somewhere and is absent somewhere
    assert(rows.exists(_._3 > 0) && rows.exists(_._3 == 0.0), "bullet branch")
    assert(rows.exists(_._4 > 0) && rows.exists(_._4 == 0.0), "ellipsis branch")
    assert(rows.exists(_._5 > 0) && rows.exists(_._5 == 0.0), "dup-line branch")
    // drops are exactly the dup-rule violations (the word-salad corpus
    // cannot fail the word-length gates; bullet/ellipsis stay under their
    // thresholds by construction nl >= 3)
    rows.foreach { case (id, _, bf, ef, df, mwl, keep) =>
      assert(bf <= 0.9 && ef <= 0.3 && mwl >= 3.0 && mwl <= 10.0,
        s"doc $id fails a gate the fixture should never trip")
      assert(keep == (df <= 0.3), s"doc $id: verdict not driven by dup rule")
    }
    // and the dup branch is the h%5 carve-out with BOTH dup copies counted
    val h = Portable.hash60(concat(lit("gq:"), col("text")))
    val hs = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(col("doc_id"), h.as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, nl, _, _, df, _, _) =>
      if (hs(id) % 5 == 0) assert(df == graft.functions.Rounding.roundTo(2.0 / nl, 6),
        s"doc $id: dup fraction != 2/n_lines")
      else assert(df == 0.0, s"doc $id: phantom duplicate line")
    }
  }

  test("t23: drift report equals an independent driver-side recomputation; JS > 0") {
    import graft.operators.TextOps
    val toks = graft.Tables.documents(spark, TestSpark.sf0001)
      .select((expr("CAST(substr(source, 4) AS INT)") % 2).as("grp"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val byTok = toks.groupBy(_._2).view.mapValues { ts =>
      (ts.count(_._1 == 0).toLong, ts.count(_._1 == 1).toLong)
    }.toMap
    val nA = byTok.values.map(_._1).sum
    val nB = byTok.values.map(_._2).sum
    val v = byTok.size.toLong
    def term(ca: Long, cb: Long): Long = {
      val p = (ca + 1).toDouble / (nA + v)
      val q = (cb + 1).toDouble / (nB + v)
      val m = (p + q) / 2
      math.round((0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)) * 1e9)
    }
    val model = byTok.map { case (t, (ca, cb)) => (t, ca, cb, term(ca, cb)) }.toSeq
    val jsModel = model.map(_._4).sum
    val expected = model.sortBy(r => (-r._4, r._1)).take(10)
      .map(r => (r._1, r._2, r._3, r._4, jsModel))
    val got = T23CorpusDrift.run(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    assert(jsModel > 0, "two slices of distinct sources should show SOME drift")
  }
}
