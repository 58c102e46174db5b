package graft.core

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.GradientDescent
import graft.operators.GradientDescent._

class BaggingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trainOne(seed: Long): IterationResult[GDState] = {
    val rnd = new scala.util.Random(seed)
    val data = Seq.fill(200) {
      val x = Array(1.0, rnd.nextGaussian())
      LabeledPoint(x, 1.0 + 2.0 * x(1))
    }
    GradientDescent.run(spark.createDataset(data).repartition(2),
      dims = 2, link = Identity, iterations = 80, learnRate = 0.3,
      seed = seed, averageGradient = true)
  }

  test("bagged ensemble: N independent jobs, all converge near truth") {
    val bag = Bagging.run(nJobs = 3)(i => trainOne(100 + i))
    assert(bag.failed.isEmpty)
    assert(bag.results.length == 3)
    bag.results.foreach { m =>
      assert(math.abs(m.weights(0) - 1.0) < 0.05)
      assert(math.abs(m.weights(1) - 2.0) < 0.05)
    }
    // Different seeds → genuinely different models (not one job repeated).
    assert(bag.results.map(_.weights.toSeq).distinct.length == 3)
  }

  test("failed job retried once (reference JobControl semantics), then reported") {
    val calls = new AtomicInteger(0)
    val bag = Bagging.run[GDState](nJobs = 2, retries = 1) { i =>
      if (i == 1) {
        calls.incrementAndGet()
        throw new RuntimeException("injected failure")
      } else trainOne(7)
    }
    assert(bag.results.length == 1)
    assert(bag.failed.map(_._1) == Seq(1))
    assert(calls.get() == 2, "failed job should be attempted exactly twice")
  }

  test("parallel submission produces the same models as sequential") {
    val seq = Bagging.run(nJobs = 2)(i => trainOne(50 + i))
    val par = Bagging.run(nJobs = 2, parallel = true)(i => trainOne(50 + i))
    val close = seq.results.zip(par.results).forall { case (a, b) =>
      a.weights.zip(b.weights).forall { case (x, y) => math.abs(x - y) < 1e-9 }
    }
    assert(close, "parallel scheduling changed the models beyond fp noise")
  }

  test("straggler-stuck job killed after master success and counted successful " +
      "(GuaguaMapReduceClient kill-as-success semantics)") {
    val hungInterrupted = new java.util.concurrent.CountDownLatch(1)
    val bag = Bagging.runKillable[GDState](
      nJobs = 2, stragglerKillMillis = 200L, pollMillis = 10L) { (i, h) =>
      val r = trainOne(100 + i)
      h.masterDone(r.master)
      if (i == 1) {
        // Master result is published; now the job hangs (a straggler that
        // never drains). The client must kill it and keep the model.
        try Thread.sleep(60000L)
        catch { case _: InterruptedException => hungInterrupted.countDown(); throw new RuntimeException("killed") }
      }
      r
    }
    assert(bag.results.length == 2, "killed-as-success job must still contribute its model")
    assert(bag.failed.isEmpty)
    assert(bag.killedAsSuccess == Seq(1))
    assert(hungInterrupted.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "kill must actually interrupt the hung job thread")
    bag.results.foreach { m =>
      assert(math.abs(m.weights(0) - 1.0) < 0.05)
      assert(math.abs(m.weights(1) - 2.0) < 0.05)
    }
  }

  test("parallel submission: hung job still killed-as-success, others unaffected") {
    val bag = Bagging.runKillable[GDState](
      nJobs = 3, parallel = true, stragglerKillMillis = 200L, pollMillis = 10L) { (i, h) =>
      val r = trainOne(200 + i)
      h.masterDone(r.master)
      if (i == 2) {
        try Thread.sleep(60000L)
        catch { case _: InterruptedException => throw new RuntimeException("killed") }
      }
      r
    }
    assert(bag.results.length == 3)
    assert(bag.failed.isEmpty)
    assert(bag.killedAsSuccess == Seq(2))
  }

  test("killed-as-success job is not retried; true failures keep retry semantics") {
    val calls = new AtomicInteger(0)
    val bag = Bagging.runKillable[GDState](
      nJobs = 2, retries = 1, stragglerKillMillis = 100L, pollMillis = 10L) { (i, h) =>
      if (i == 1) {
        calls.incrementAndGet()
        throw new RuntimeException("fails before master success")
      }
      val r = trainOne(7)
      h.masterDone(r.master)
      r
    }
    assert(bag.results.length == 1)
    assert(bag.failed.map(_._1) == Seq(1))
    assert(bag.killedAsSuccess.isEmpty)
    assert(calls.get() == 2, "pre-master failure should be attempted exactly twice")
  }

  test("metrics listener records one entry per iteration") {
    val ml = new MetricsListener[Long]
    graft.core.Iterate.run[Long, Long, Long](
      spark.createDataset(Seq(1L, 2L, 3L)).repartition(2),
      new graft.operators.IterativeSum.SumWorker,
      new graft.operators.IterativeSum.SumMaster,
      maxIterations = 4, combine = Some(_ + _), listeners = Seq(ml))
    assert(ml.snapshot.map(_.iteration) == Seq(1, 2, 3, 4))
    assert(ml.snapshot.forall(_.elapsedMillis >= 0))
    assert(ml.total > 0)
  }
}
