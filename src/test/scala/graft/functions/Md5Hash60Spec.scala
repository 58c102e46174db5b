package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Round-15 optimization pin: the native [[org.apache.spark.sql.graft.Md5Hash60]]
  * expression must be BIT-IDENTICAL to the composed
  * `conv(substring(md5(cast(x as binary)), 1, 15), 16, 10)` chain it
  * replaced — same values on every input class (ASCII, unicode multibyte,
  * empty, long, null), interpreted and codegen'd, so every oracle-checked
  * hash in the engine is unchanged by construction.
  */
class Md5Hash60Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("native hash60 equals the composed md5/conv chain on hostile inputs") {
    import spark.implicits._
    val fixtures = Seq(
      "", "a", "hello world", "sf0.001", "0", "deadbeef",
      "äöü ßharp ünïcode", "日本語のテキスト", "emoji 🙂 mixed",
      "x" * 10000, "líne\nbréak\ttab", "trailing space ", " ")
    val df = fixtures.toDF("s")
      .select(
        Portable.hash60(col("s")).as("native"),
        Portable.hash60Composed(col("s")).as("composed"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"hash drift on fixture: $r")
    }
  }

  test("non-string input fails analysis instead of hashing its decimal string") {
    // Round-16 ADVICE fix: the composed witness digests cast(x AS BINARY),
    // so an implicit non-string→string cast here would hash DIFFERENT
    // bytes than the witness. The expression now rejects non-string input
    // at analysis time (ExpectsInputTypes without the implicit cast).
    import spark.implicits._
    val df = Seq(42L).toDF("x")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Portable.hash60(col("x"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("md5_hash60") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("null propagates as null, like the md5 chain") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("s")
      .select(Portable.hash60(col("s")).as("native"),
        Portable.hash60Composed(col("s")).as("composed"))
      .head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("equality over every token of the corpus (codegen path, volume)") {
    val toks = Tables.documents(spark, TestSpark.sf001)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
    val bad = toks
      .select(Portable.hash60(col("t")).as("native"),
        Portable.hash60Composed(col("t")).as("composed"))
      .filter(col("native") =!= col("composed"))
      .count()
    assert(bad == 0L)
  }

  test("seeded family and literal folding agree with the composed form") {
    import spark.implicits._
    val df = Seq("tok1", "tok2").toDF("s")
      .select(Portable.hash60(col("s"), 7).as("native"),
        Portable.hash60Composed(concat(lit("7:"), col("s"))).as("composed"),
        Portable.hash60(lit("const")).as("folded"),
        Portable.hash60Composed(lit("const")).as("foldedComposed"))
    df.collect().foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }
}
