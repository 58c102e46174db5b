package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.NeuralNet._

class NeuralNetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gradient matches numerical finite differences") {
    val layers = Layers(Seq(2, 3, 1))
    val rnd = new Random(1)
    val w = Array.fill(layers.nWeights)(rnd.nextDouble() - 0.5)
    val s = Sample(Array(0.3, -0.7), 1.0, 0L)
    val grad = new Array[Double](w.length)
    backprop(layers, w, s, grad)
    val eps = 1e-6
    def loss(wi: Array[Double]): Double = {
      val out = forward(layers, wi, s.features).last
      out.map(o => (o - s.label) * (o - s.label) / 2).sum
    }
    for (i <- w.indices) {
      val wp = w.clone(); wp(i) += eps
      val wm = w.clone(); wm(i) -= eps
      val num = (loss(wp) - loss(wm)) / (2 * eps)
      assert(math.abs(grad(i) - num) < 1e-6, s"grad($i): ${grad(i)} vs numeric $num")
    }
  }

  test("distributed training learns XOR (C6 end-to-end on the kernel)") {
    val xor = Seq(
      (Array(0.0, 0.0), 0.0), (Array(0.0, 1.0), 1.0),
      (Array(1.0, 0.0), 1.0), (Array(1.0, 1.0), 0.0))
    // Duplicate with train-side split keys so every point lands in training.
    val samples = (0 until 200).flatMap { r =>
      xor.zipWithIndex.map { case ((x, y), i) =>
        var k = r * 4 + i
        while (!isTrain(k)) k += 1 // force train membership, deterministic
        Sample(x, y, k)
      }
    }
    val ds = spark.createDataset(samples).repartition(4)
    val r = NeuralNet.train(ds, Layers(Seq(2, 4, 1)),
      iterations = 300, learnRate = 0.05, seed = 7L)
    val w = r.master.weights
    xor.foreach { case (x, y) =>
      val out = forward(Layers(Seq(2, 4, 1)), w, x).last.head
      assert(math.abs(out - y) < 0.25, s"XOR(${x.mkString(",")}) = $out, want $y")
    }
    assert(r.master.trainError < 0.03)
  }

  test("quickprop update learns XOR at least as fast as plain GD (C6 quickprop path)") {
    val xor = Seq(
      (Array(0.0, 0.0), 0.0), (Array(0.0, 1.0), 1.0),
      (Array(1.0, 0.0), 1.0), (Array(1.0, 1.0), 0.0))
    val samples = (0 until 200).flatMap { r =>
      xor.zipWithIndex.map { case ((x, y), i) =>
        var k = r * 4 + i
        while (!isTrain(k)) k += 1
        Sample(x, y, k)
      }
    }
    val ds = spark.createDataset(samples).repartition(4)
    val rQp = NeuralNet.train(ds, Layers(Seq(2, 4, 1)),
      iterations = 300, seed = 7L,
      update = Some(new NeuralNet.QuickpropUpdate(epsilon = 0.05)))
    val w = rQp.master.weights
    xor.foreach { case (x, y) =>
      val out = forward(Layers(Seq(2, 4, 1)), w, x).last.head
      assert(math.abs(out - y) < 0.25, s"XOR(${x.mkString(",")}) = $out, want $y")
    }
    // Same budget, same seed, same data as the plain-GD XOR test: the
    // second-order step must converge at least as tightly as GD's 0.03.
    assert(rQp.master.trainError < 0.03,
      s"quickprop trainError ${rQp.master.trainError}")
  }

  test("deterministic split sends ~half of keys to train, stable across calls") {
    val keys = (0L until 10000L)
    val trainCount = keys.count(isTrain)
    assert(math.abs(trainCount - 5000) < 300, s"split skew: $trainCount/10000")
    assert(keys.map(isTrain) == keys.map(isTrain))
  }

  test("test split is scored, not trained on") {
    val rnd = new Random(3)
    val samples = (0 until 400).map { i =>
      val x = Array(rnd.nextGaussian(), rnd.nextGaussian())
      Sample(x, if (x(0) + x(1) > 0) 1.0 else 0.0, i.toLong)
    }
    val ds = spark.createDataset(samples).repartition(4)
    val r = NeuralNet.train(ds, Layers(Seq(2, 3, 1)),
      iterations = 100, learnRate = 0.1, seed = 5L)
    // Both errors finite and populated — test error computed on held-out rows.
    assert(r.master.trainError > 0 && r.master.trainError < 0.5)
    assert(r.master.testError > 0 && r.master.testError < 0.5)
  }
}
