package graft.examples

/** Runnable example: train linear + logistic models through the public
  * GradientDescent API — doubles as the end-to-end drive for the iterate
  * kernel outside the query surface.
  */
import org.apache.spark.sql.SparkSession
import graft.operators.GradientDescent
import graft.operators.GradientDescent._

object GradientDescentExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS); fixed at session build so read
      // behavior never depends on query execution order (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val data = Seq.fill(300) {
      val x = Array(1.0, rnd.nextGaussian(), rnd.nextGaussian())
      LabeledPoint(x, 2.0 + 1.5 * x(1) - 0.5 * x(2))
    }
    val r = GradientDescent.run(spark.createDataset(data).repartition(4),
      dims = 3, link = Identity, iterations = 150, learnRate = 0.3,
      seed = 42L, averageGradient = true)
    println(f"DRIVE weights=${r.master.weights.map(w => f"$w%.4f").mkString(",")} iters=${r.iterations} err=${r.master.iterationError}%.6g")
    // C6: distributed NN training through the same kernel
    import graft.operators.NeuralNet
    val nnData = Seq.fill(400) {
      val x = Array(rnd.nextGaussian(), rnd.nextGaussian())
      NeuralNet.Sample(x, if (x(0) * x(1) > 0) 1.0 else 0.0, rnd.nextLong() & Long.MaxValue)
    }
    val nn = NeuralNet.train(spark.createDataset(nnData).repartition(4),
      NeuralNet.Layers(Seq(2, 6, 1)), iterations = 200, learnRate = 0.05, seed = 11L)
    println(f"DRIVE-NN trainErr=${nn.master.trainError}%.4f testErr=${nn.master.testError}%.4f iters=${nn.iterations}")

    // Bagged ensemble through the multi-job utility (reference §2.D bagging)
    val bag = graft.core.Bagging.run(nJobs = 3) { i =>
      val brnd = new scala.util.Random(500 + i)
      val bdata = Seq.fill(200) {
        val x = Array(1.0, brnd.nextGaussian())
        GradientDescent.LabeledPoint(x, 1.0 + 2.0 * x(1))
      }
      GradientDescent.run(spark.createDataset(bdata).repartition(2),
        dims = 2, link = Identity, iterations = 80, learnRate = 0.3,
        seed = 500 + i, averageGradient = true)
    }
    val avgW = bag.results.map(_.weights).transpose.map(ws => ws.sum / ws.length)
    println(f"DRIVE-BAG models=${bag.results.length} failed=${bag.failed.length} avgW=${avgW.map(w => f"$w%.3f").mkString(",")}")

    // C6 quickprop path: same data/network, second-order weight updates.
    val qp = NeuralNet.train(spark.createDataset(nnData).repartition(4),
      NeuralNet.Layers(Seq(2, 6, 1)), iterations = 200, seed = 11L,
      update = Some(new NeuralNet.QuickpropUpdate(epsilon = 0.05)))
    println(f"DRIVE-QP trainErr=${qp.master.trainError}%.4f iters=${qp.iterations}")

    // A7 quorum barrier + A13 system listeners: 16 partitions, straggler
    // tolerated at 75% after a 1s window, timing stats to stdout.
    val qdata = spark.createDataset((1L to 160L)).repartition(16)
    val quorum = graft.core.Iterate.run[Long, Long, Long](
      qdata,
      new graft.core.WorkerComputable[Long, Long, Long] {
        def compute(rs: Iterator[Long], last: Option[Long],
            ctx: graft.core.IterationContext): Long = {
          val vs = rs.toList
          if (vs.contains(160L)) Thread.sleep(10000) // the straggler
          vs.sum
        }
      },
      new graft.core.MasterComputable[Long, Long] {
        def compute(ws: Iterator[Long], last: Option[Long],
            ctx: graft.core.IterationContext): Long = ws.sum
      },
      maxIterations = 2, combine = Some(_ + _),
      listeners = Seq(graft.core.Listeners.timing[Long](s => println(s"DRIVE-QUORUM $s"))),
      minWorkersRatio = 0.75,
      minWorkersTimeout = scala.concurrent.duration.DurationInt(1).second)
    println(s"DRIVE-QUORUM partial-sum=${quorum.master} iters=${quorum.iterations}")

    // probe: empty dataset partition behavior
    val empty = spark.createDataset(Seq.empty[LabeledPoint])
    try {
      val r2 = GradientDescent.run(empty, dims = 3, link = Sigmoid, iterations = 3, learnRate = 0.1)
      println(s"DRIVE-EMPTY ok iters=${r2.iterations} w0=${r2.master.weights(0)}")
    } catch { case e: Throwable => println(s"DRIVE-EMPTY threw: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    spark.stop()
  }
}
