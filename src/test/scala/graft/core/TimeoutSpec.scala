package graft.core

import scala.concurrent.duration._

import org.apache.spark.SparkException
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Partition containing value 99 stalls; others answer instantly. */
private class StragglerWorker extends WorkerComputable[Long, Long, Long] {
  def compute(records: Iterator[Long], last: Option[Long], ctx: IterationContext): Long = {
    val vs = records.toList
    if (vs.contains(99L)) Thread.sleep(30000)
    vs.sum
  }
}

private class SleepAllWorker extends WorkerComputable[Long, Long, Long] {
  def compute(records: Iterator[Long], last: Option[Long], ctx: IterationContext): Long = {
    Thread.sleep(30000); 0L
  }
}

private object TimeoutSumMaster extends MasterComputable[Long, Long] {
  def compute(ws: Iterator[Long], last: Option[Long], ctx: IterationContext): Long = ws.sum
}

class TimeoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data = spark.createDataset(Seq(1L, 2L, 3L, 99L)).repartition(4)

  test("soft timeout drops the straggler's result, quorum proceeds (A7/A9 soft mode)") {
    val ds = data
    // Expected = sum over partitions that do NOT contain the straggler value
    // (repartition placement is deterministic but implementation-defined).
    val expected = ds.rdd.glom().collect()
      .filter(!_.contains(99L)).map(_.sum).sum
    val r = Iterate.run[Long, Long, Long](
      ds, new StragglerWorker, TimeoutSumMaster, maxIterations = 1,
      combine = Some(_ + _), workerTimeout = Some(1.second), workerTimeoutSoft = true)
    assert(r.master == expected)
  }

  test("hard timeout fails the job (reference hard mode kills the task)") {
    val e = intercept[SparkException] {
      Iterate.run[Long, Long, Long](
        data, new StragglerWorker, TimeoutSumMaster, maxIterations = 1,
        combine = Some(_ + _), workerTimeout = Some(1.second), workerTimeoutSoft = false)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("hard timeout")))
  }

  test("all-partitions timeout reports a clear error") {
    val e = intercept[IllegalStateException] {
      Iterate.run[Long, Long, Long](
        data, new SleepAllWorker, TimeoutSumMaster, maxIterations = 1,
        combine = Some(_ + _), workerTimeout = Some(500.millis), workerTimeoutSoft = true)
    }
    assert(e.getMessage.contains("timed out"))
  }
}
