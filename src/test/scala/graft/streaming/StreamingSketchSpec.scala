package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Count-min over a STREAM equals count-min over the batch: the sketch's
  * defining property is cell-wise mergeability, and Spark's stateful
  * grouped aggregation is exactly that merge — each micro-batch's partial
  * cells fold into the running state the same way batch map-side partials
  * fold into the shuffle. If the cells match after arbitrary batch
  * splitting, sketch ingestion can move to the stream with zero semantic
  * drift (the d8-Bloom / p3-quota streaming-parity discipline applied to
  * frequency sketches).
  */
class StreamingSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streamed sketch cells (3 micro-batches) equal the single-pass batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tokens = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("token"))
      .collect().map(_.getString(0))
    assert(tokens.nonEmpty)

    val batchCells = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(explode(graft.operators.TextOps.tokens(col("text"))).as("token"))
      .select(graft.queries.T15CountMin.cells.as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val stream = MemoryStream[String]
    val q = stream.toDF().select(col("value").as("token"))
      .select(graft.queries.T15CountMin.cells.as("rb"))
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).count()
      .writeStream.format("memory").queryName("cms_cells")
      .outputMode("complete").start()
    try {
      // Arbitrary split into 3 micro-batches — mergeability means the split
      // points cannot matter.
      val (a, rest) = tokens.splitAt(tokens.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      for (chunk <- Seq(a, b, c)) { stream.addData(chunk.toIndexedSeq); q.processAllAvailable() }
      val streamed = spark.table("cms_cells")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed == batchCells,
        s"stream/batch sketch diverged: ${streamed.size} vs ${batchCells.size} cells")
    } finally q.stop()
  }
}
