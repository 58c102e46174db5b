package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** g2/g4 degree-oriented wedge pivot (Suri & Vassilvitskii, WWW 2011):
  *
  *   1. the census is ORIENTATION-INVARIANT — degree- and id-oriented runs
  *      produce identical rows, on a hub fixture and on the real corpus
  *      (this is also why the id-oriented DuckDB oracle stays valid);
  *   2. the SCALE claim: on a hub graph the wedge join's candidate volume
  *      (Σ per-pivot spoke pairs) collapses under degree orientation —
  *      the hub's edges all point into it, so it pivots nothing.
  */
class OrientationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sweep(): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** Hub fixture: vertex 50 sits in the MIDDLE of the id order with 25
    * lower-id and 25 higher-id spokes — the exact shape where id-oriented
    * wedging pivots in×out = 625 candidate pairs at the hub. Two extra
    * leaf–leaf edges close two triangles so the census is non-trivial.
    */
  private lazy val hubPairs = {
    import spark.implicits._
    val edges =
      (1L to 25L).map(i => (i, 50L)) ++
        (101L to 125L).map(j => (50L, j)) ++
        Seq((1L, 2L), (101L, 102L))
    edges.toDF("vec_a", "vec_b")
  }

  test("census is identical under degree- and id-orientation (hub fixture)") {
    val byDeg = canon(G2Triangles.runOverPairs(spark, hubPairs, degreeOriented = true))
    sweep()
    val byId = canon(G2Triangles.runOverPairs(spark, hubPairs, degreeOriented = false))
    sweep()
    assert(byDeg == byId)
    // n_nodes=51, n_edges=52, triangles: (1,2,50) and (50,101,102)
    val row = byDeg.head.split("\\|")
    assert(row(0) == "51" && row(1) == "52" && row(3) == "2", byDeg.head)
  }

  test("census is identical under both orientations on the real d5 pair graph") {
    val pairs = D5EmbedDedup.run(spark, TestSpark.sf0001)
      .select(col("vec_a"), col("vec_b"))
    val byDeg = canon(G2Triangles.runOverPairs(spark, pairs, degreeOriented = true))
    sweep()
    val byId = canon(G2Triangles.runOverPairs(spark, pairs, degreeOriented = false))
    sweep()
    assert(byDeg == byId && byDeg.nonEmpty)
  }

  test("degree orientation collapses the hub's wedge-candidate volume") {
    val e = hubPairs.select(col("vec_a").as("a"), col("vec_b").as("b"))
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // id-oriented wedge join (x.b = y.a) probes in(v)·out(v) pairs per pivot
    val inOut = e.groupBy(col("b").as("v")).agg(count(lit(1)).as("in"))
      .join(e.groupBy(col("a").as("v")).agg(count(lit(1)).as("out")), "v")
      .agg(sum(col("in") * col("out"))).collect()(0).getLong(0)
    // degree-oriented join probes C(outdeg, 2) pairs per pivot
    val orOut = G2Triangles.orientEdges(e, deg)
      .groupBy(col("s")).agg(count(lit(1)).as("out"))
      .agg((sum(col("out") * (col("out") - 1)) / 2).cast("long"))
      .collect()(0).getLong(0)
    assert(inOut >= 625, s"fixture lost its hub (id-oriented volume $inOut)")
    assert(orOut <= 4, s"degree orientation should strip the hub pivot, got $orOut")
  }
}
