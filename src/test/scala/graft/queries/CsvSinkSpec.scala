package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q29's oracle pins the corpus round-trip; this spec drives the CSV
  * quote/escape machinery through the characters RFC 4180 actually fights
  * over — embedded quotes, separators, newlines — plus the empty-vs-null
  * distinction CSV is famously lossy about, all under q29's OWN shared
  * option set so the policy pinned here is the policy the query runs.
  */
class CsvSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hostile text survives the CSV round-trip; empty and null stay distinct") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "quote \" and comma , together"),
      (2L, "embedded\nnewline and \r carriage"),
      (3L, "\"fully quoted\" with trailing , comma,"),
      (4L, "unicode café 中文 😀"),
      (5L, ""),
      (6L, null: String))
    val df = hostile.toDF("id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-csv-hostile").toString
    df.write.mode("overwrite").options(Q29CsvSink.csvWriteOptions).csv(out)
    val back = spark.read.schema(df.schema).options(Q29CsvSink.csvReadOptions).csv(out)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    hostile.foreach { case (id, t) =>
      assert(back(id) == t, s"row $id mutated in the CSV round-trip: ${back(id)}")
    }
    assert(back(5L) == "" && back(6L) == null,
      "the empty-vs-null distinction must survive (emptyValue option)")
  }
}
