package graft.core

import scala.util.{Failure, Success, Try}

/** Multi-job bagging — the reference's client-side `addJob(args)` × N +
  * JobControl loop with one retry per failed job
  * (guagua-mapreduce/.../GuaguaMapReduceClient.java:123-288) as a driver
  * utility: run N independent iterate jobs (different seeds / data slices),
  * retry failures once, collect the survivors.
  *
  * Jobs run sequentially by default — on a shared cluster the scheduler
  * already interleaves their stages; `parallel = true` submits them from
  * concurrent driver threads (Spark's scheduler is thread-safe) for
  * latency-bound ensembles of small jobs.
  */
object Bagging {

  final case class BagResult[M](results: Seq[M], failed: Seq[(Int, Throwable)])

  def run[M](
      nJobs: Int,
      parallel: Boolean = false,
      retries: Int = 1)(job: Int => IterationResult[M]): BagResult[M] = {

    def attempt(i: Int): Try[IterationResult[M]] = {
      var last: Try[IterationResult[M]] = Failure(new IllegalStateException("not run"))
      var tries = 0
      while (tries <= retries && last.isFailure) {
        last = Try(job(i))
        tries += 1
      }
      last
    }

    val indices = 0 until nJobs
    val outcomes: Seq[(Int, Try[IterationResult[M]])] =
      if (parallel) {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(
          Future.sequence(indices.map(i => Future(i -> attempt(i)))), Duration.Inf)
      } else indices.map(i => i -> attempt(i))

    BagResult(
      outcomes.collect { case (_, Success(r)) => r.master },
      outcomes.collect { case (i, Failure(e)) => (i, e) })
  }
}

/** Per-iteration timing/size metrics — the reference's system interceptors
  * (TimeStats/MemoryStats, wired via GuaguaConstants defaults) as a
  * listener. Collects on the driver; expose via `snapshot`.
  */
final class MetricsListener[M] extends IterationListener[M] {
  final case class IterationMetric(iteration: Int, elapsedMillis: Long)

  private val buf = scala.collection.mutable.ArrayBuffer.empty[IterationMetric]
  private var totalMillis = 0L

  override def onIterationEnd(i: Int, m: M, ms: Long): Unit =
    buf.synchronized { buf += IterationMetric(i, ms) }
  override def onComplete(r: IterationResult[M]): Unit =
    totalMillis = r.elapsedMillis

  def snapshot: Seq[IterationMetric] = buf.synchronized(buf.toList)
  def total: Long = totalMillis
}
