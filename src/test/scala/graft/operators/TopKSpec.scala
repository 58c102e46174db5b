package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TopK (typed bounded aggregator) must be EXACTLY the rank window under the
  * same (score desc, id asc) total order — including boundary ties — or v2's
  * swap from the window formulation silently changes results.
  */
class TopKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("aggregator top-k == row_number window top-k, including score ties") {
    import spark.implicits._
    // Deterministic fixture with deliberate score ties: score = (i*7) % 13,
    // so many rows per group share a score and the id tie-break decides.
    val rows = for (g <- 0L until 20L; i <- 0L until 97L)
      yield (g, ((i * 7) % 13).toDouble, g * 1000 + i, (i % 5).toInt)
    val df = rows.toDF("g", "score", "id", "payload")
    val k = 10
    val viaWindow = df.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("score").desc, col("id").asc)))
      .filter(col("rk") <= k)
      .select(col("g"), col("score"), col("id"), col("payload"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, -t._2, t._3))
    val viaAgg = df.select(col("g"), col("score"), col("id"), col("payload"))
      .as[(Long, Double, Long, Int)]
      .groupByKey(_._1)
      .mapValues { case (_, s, id, p) => (s, id, p) }
      .agg(TopK.topK(k).name("top"))
      .flatMap { case (g, top) => top.map(e => (g, e._1, e._2, e._3)) }
      .collect()
      .sortBy(t => (t._1, -t._2, t._3))
    assert(viaAgg.length == viaWindow.length)
    assert(viaAgg.sameElements(viaWindow),
      "aggregator top-k diverged from the window formulation")
  }
}
