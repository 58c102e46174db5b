package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Smoke + shape checks for every registered query at sf0.001. Value-level
  * correctness is the driver's DuckDB gate (tools/check_oracle.py locally).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  for (q <- Registry.all) {
    test(s"${q.name}: runs, returns rows, stable column names") {
      val df = q.run(spark, TestSpark.sf0001)
      val rows = df.count()
      assert(rows > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length, "duplicate column names")
      // Oracle must reference every output column by the same name; cheap
      // guard: each output column name appears verbatim in the SQL text.
      q.oracle.foreach { sql =>
        val lower = sql.toLowerCase
        for (c <- df.columns)
          assert(lower.contains(c.toLowerCase), s"column $c missing from oracle SQL of ${q.name}")
      }
    }
  }

  test("registry names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.length == names.length)
  }
}
