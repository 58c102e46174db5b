package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import org.apache.spark.sql.graft.SortedContains

class SortedContainsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binary search agrees with array_contains on sorted arrays (incl. bounds + empty)") {
    import spark.implicits._
    SortedContains.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val arr = Seq.fill(rnd.nextInt(20))(rnd.nextInt(50).toLong).distinct.sorted
      val probe = rnd.nextInt(60).toLong - 5 // below, inside, and above range
      (i.toLong, arr, probe)
    } :+ ((201L, Seq.empty[Long], 3L)) // empty array
    val df = rows.toDF("id", "arr", "v")
    val bad = df.select(
      SortedContains.sortedContains(col("arr"), col("v")).as("bs"),
      array_contains(col("arr"), col("v")).as("lin"))
      .filter(col("bs") =!= col("lin")).count()
    assert(bad == 0)
  }

  test("null propagation: null array or null probe yields NULL") {
    import spark.implicits._
    SortedContains.register(spark)
    val df = Seq(
      (Option(Seq(1L, 2L)), Option.empty[Long]),
      (Option.empty[Seq[Long]], Option(1L)))
      .toDF("arr", "v")
    val got = df.select(SortedContains.sortedContains(col("arr"), col("v"))).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("SQL route: usable from plain spark.sql after registerFunctions") {
    graft.GraftSession.registerFunctions(spark)
    val r = spark.sql(
      "SELECT sorted_contains(array(1L, 5L, 9L), 5L) AS a, sorted_contains(array(1L, 5L, 9L), 6L) AS b")
      .collect()(0)
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("codegen and interpreted paths agree (wholestage off)") {
    import spark.implicits._
    SortedContains.register(spark)
    val df = (1L to 100L).map(i => (i, (1L to i).filter(_ % 3 == 0).toSeq)).toDF("v", "arr")
    def run() = df.select(col("v"),
      SortedContains.sortedContains(col("arr"), col("v"))).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val on = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val off = run()
      assert(on == off)
      assert(on(3L) && !on(4L) && on(99L) && !on(100L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
