package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.queries.T25HistogramQuantiles

/** Quantile monitoring as a live stage: EventStream.histogramBins over
  * prices arriving in arbitrary micro-batches must land on exactly the
  * (group, bin, c) table batch t25 builds — histogram merge is element-wise
  * addition, which IS stateful grouped counting — and because the bins are
  * exact integers, `T25HistogramQuantiles.quantiles` over the streamed
  * snapshot equals batch t25's published rows BIT FOR BIT (the property
  * that separates this sketch from a GK/t-digest stream, whose merge is
  * neither exact nor order-free).
  */
class HistogramStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed histogram bins equal batch t25's; quantiles from them match bit-exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val liDf = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val rows = liDf.as[(String, Double)].collect().toSeq

    val batchBins = T25HistogramQuantiles.histogram(liDf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batchQuantiles = T25HistogramQuantiles.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

    val stream = MemoryStream[(String, Double)]
    val bins = EventStream.histogramBins(
      stream.toDF().toDF("l_returnflag", "l_extendedprice"))
    val q = bins.writeStream.format("memory").queryName("hist_bins")
      .outputMode("complete").start()
    try {
      val thirds = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      thirds.foreach { part => stream.addData(part); q.processAllAvailable() }
      val streamed = spark.table("hist_bins").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batchBins, "streamed bins diverged from the batch histogram")
      // state bound: bins per group limited by the price RANGE, not rows
      streamed.keys.groupBy(_._1).foreach { case (g, ks) =>
        assert(ks.size < 1000, s"group $g holds ${ks.size} bins — range bound broken")
      }
      val quantsFromStream = T25HistogramQuantiles.quantiles(spark.table("hist_bins"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(quantsFromStream == batchQuantiles,
        "quantiles over streamed bins != batch t25")
    } finally q.stop()
  }
}
