package graft.examples

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.core._

/** A11 fail-over demonstration: every partition's FIRST attempt throws; the
  * scheduler's task retry (master `local[2,2]`) re-runs it and the kernel
  * completes with the exact answer. The reference gets the same behavior
  * from MR/YARN attempt limits (GuaguaYarnConstants ≤4 attempts); workers
  * being pure functions of (partition, lastMaster) is what makes the retry
  * safe.
  *
  * Runs as its own JVM (a second SparkContext with a different master can't
  * coexist with the shared test session).
  */
object FailoverExample {

  private object FlakyState {
    val attempts = new ConcurrentHashMap[Int, Integer]()
  }

  private class FlakyWorker extends WorkerComputable[Long, Long, Long] {
    def compute(records: Iterator[Long], last: Option[Long], ctx: IterationContext): Long = {
      val vs = records.toList
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val n = FlakyState.attempts.merge(pid, 1, (a, b) => a + b)
      if (n == 1) throw new RuntimeException(s"injected transient failure on partition $pid")
      last.getOrElse(0L) + vs.sum
    }
  }

  private object SumMaster extends MasterComputable[Long, Long] {
    def compute(ws: Iterator[Long], last: Option[Long], ctx: IterationContext): Long = ws.sum
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2,2]") // 2 threads, 2 task attempts
      .appName("graft-failover")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val data = spark.createDataset(Seq(1L, 2L, 3L, 4L, 5L, 6L)).repartition(2)
    val r = Iterate.run[Long, Long, Long](
      data, new FlakyWorker, SumMaster, maxIterations = 2, combine = Some(_ + _))
    // s_2 = 2·s_1 + 21 with s_1 = 21 → 63; both partitions failed once first.
    val ok = r.master == 63L && FlakyState.attempts.size() == 2
    println(s"DRIVE-FAILOVER result=${r.master} partitionsRetried=${FlakyState.attempts.size()} ok=$ok")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
