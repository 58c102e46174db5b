package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.GradientDescent._

class GradientDescentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Synthetic logistic data, seeded like the reference's lr fixture shape
  // (2 features + bias, ~200 rows; lr/LogisticRegressionWorker.java:147-165
  // prepends the 1.0 bias at load — replicated here).
  private def logisticData(n: Int, seed: Long): Seq[LabeledPoint] = {
    val rnd = new Random(seed)
    val trueW = Array(0.5, 2.0, -1.5)
    Seq.fill(n) {
      val x = Array(1.0, rnd.nextGaussian(), rnd.nextGaussian())
      val p = 1.0 / (1.0 + math.exp(-(trueW(0) * x(0) + trueW(1) * x(1) + trueW(2) * x(2))))
      LabeledPoint(x, if (rnd.nextDouble() < p) 1.0 else 0.0)
    }
  }

  /** Driver-side sequential replay of the exact reference recurrence. */
  private def replay(data: Seq[LabeledPoint], link: Link, iters: Int, lr: Double,
      seed: Long): Array[Double] = {
    val rnd = new Random(seed)
    var w = Array.fill(3)(rnd.nextDouble())
    for (_ <- 2 to iters) {
      val grad = new Array[Double](3)
      data.foreach { p =>
        val z = w.indices.map(i => w(i) * p.features(i)).sum
        val err = link(z) - p.label
        w.indices.foreach(i => grad(i) += err * p.features(i))
      }
      w = w.indices.map(i => w(i) - lr * grad(i)).toArray
    }
    w
  }

  test("LR loop matches a sequential replay of the reference recurrence") {
    val data = logisticData(200, seed = 7)
    val ds = spark.createDataset(data).repartition(4)
    val r = GradientDescent.run(ds, dims = 3, link = Sigmoid,
      iterations = 10, learnRate = 0.01, seed = 42L)
    val expected = replay(data, Sigmoid, 10, 0.01, 42L)
    assert(r.iterations == 10)
    r.master.weights.zip(expected).foreach { case (got, want) =>
      // Distributed summation order differs from sequential; tolerance only.
      assert(math.abs(got - want) < 1e-8, s"weight drift: $got vs $want")
    }
  }

  test("LNR with averaged gradient recovers a linear relationship") {
    val rnd = new Random(11)
    val trueW = Array(1.0, 3.0, -2.0)
    val data = Seq.fill(500) {
      val x = Array(1.0, rnd.nextGaussian(), rnd.nextGaussian())
      LabeledPoint(x, trueW(0) * x(0) + trueW(1) * x(1) + trueW(2) * x(2))
    }
    val ds = spark.createDataset(data).repartition(4)
    val r = GradientDescent.run(ds, dims = 3, link = Identity,
      iterations = 200, learnRate = 0.5, seed = 1L, averageGradient = true)
    r.master.weights.zip(trueW).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-3, s"no convergence: $got vs $want")
    }
  }

  test("training error decreases over iterations (smoke, reference LrTest shape)") {
    val data = logisticData(200, seed = 3)
    val ds = spark.createDataset(data).repartition(2)
    val errors = scala.collection.mutable.ArrayBuffer.empty[Double]
    val listener = new graft.core.IterationListener[GDState] {
      override def onIterationEnd(i: Int, m: GDState, ms: Long): Unit =
        if (i >= 2) errors += m.iterationError
    }
    graft.core.Iterate.run[LabeledPoint, GDState, GradPayload](
      ds, new Worker(Sigmoid, 3), new Master(3, 0.05, 42L, averageGradient = false),
      maxIterations = 20, combine = Some((a, b) => a.merge(b)), listeners = Seq(listener))
    assert(errors.size == 19)
    assert(errors.last < errors.head, s"error did not decrease: ${errors.head} -> ${errors.last}")
  }
}
