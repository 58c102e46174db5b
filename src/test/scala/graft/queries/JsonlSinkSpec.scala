package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q28's oracle pins the corpus round-trip; this spec drives the JSONL
  * encode/decode through the characters the word-salad corpus never
  * exercises — the ones JSON actually escapes — so a lossy escape path
  * cannot hide behind benign data.
  */
class JsonlSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("hostile text survives the JSONL round-trip byte for byte") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "quote \" backslash \\ slash / end"),
      (2L, "newline \n tab \t carriage \r bell "),
      (3L, "unicode café 中文 emoji 😀 zwj ‍"),
      (4L, "{\"looks\":\"like json\"} [1,2,3] null true"),
      (5L, ""))
    val df = hostile.toDF("id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-hostile").toString
    df.write.mode("overwrite").json(out)
    val back = spark.read.schema(df.schema).json(out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    hostile.foreach { case (id, t) =>
      assert(back(id) == t, s"row $id mutated in the JSON round-trip")
    }
  }
}
