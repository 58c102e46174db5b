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

  final case class BagResult[M](
      results: Seq[M],
      failed: Seq[(Int, Throwable)],
      killedAsSuccess: Seq[Int] = Nil)

  /** Handle a job uses to publish its FINAL master state the moment the
    * master fold completes — before sinks, cleanup, or straggler drain. The
    * Spark analog of the reference's MASTER_SUCCESS job counter
    * (GuaguaMapReduceClient.java:172-179): once this is set, the client
    * already "has the models", so a job whose tail hangs can be killed and
    * still counted successful. First call wins; later calls are ignored.
    */
  final class MasterSuccess[M] {
    @volatile private[Bagging] var state: Option[(M, Long)] = None
    def masterDone(m: M): Unit =
      if (state.isEmpty) state = Some((m, System.nanoTime()))
  }

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

  /** [[run]] plus the reference client's straggler-stuck-job kill
    * (GuaguaMapReduceClient.java:170-199, 213-219): a job whose master
    * result is already in hand (the job called
    * [[MasterSuccess.masterDone]]) but whose completion then hangs past
    * `stragglerKillMillis` is KILLED (thread interrupt — the Spark analog
    * of `killJob`) and counted successful with the published master state;
    * killed-as-success jobs are never retried, exactly like the
    * reference's `killedSuccessJobSet` short-circuit. A job that fails
    * before publishing a master result keeps [[run]]'s retry-once
    * semantics.
    */
  def runKillable[M](
      nJobs: Int,
      parallel: Boolean = false,
      retries: Int = 1,
      stragglerKillMillis: Long = 2 * 60 * 1000L,
      pollMillis: Long = 50L)(
      job: (Int, MasterSuccess[M]) => IterationResult[M]): BagResult[M] = {
    import java.util.concurrent.{ExecutionException, FutureTask, TimeUnit, TimeoutException}

    // (outcome, killedAsSuccess) for one job, with retries on true failure.
    def attempt(i: Int): (Try[M], Boolean) = {
      var last: (Try[M], Boolean) = (Failure(new IllegalStateException("not run")), false)
      var tries = 0
      while (tries <= retries && last._1.isFailure && !last._2) {
        val h = new MasterSuccess[M]
        val task = new FutureTask[IterationResult[M]](() => job(i, h))
        val th = new Thread(task, s"bag-job-$i-attempt-$tries")
        th.setDaemon(true)
        th.start()
        var killed = false
        while (!task.isDone && !killed) {
          h.state match {
            case Some((_, t0))
                if (System.nanoTime() - t0) / 1000000L >= stragglerKillMillis =>
              // Master finished, stragglers hang: kill the job, keep the model.
              task.cancel(true)
              killed = true
            case _ =>
              try { task.get(pollMillis, TimeUnit.MILLISECONDS); () }
              catch { case _: TimeoutException => () case _: Throwable => () }
          }
        }
        last =
          if (killed) (Success(h.state.get._1), true)
          else
            (Try(task.get()).map(_.master).recoverWith {
              case e: ExecutionException => Failure(Option(e.getCause).getOrElse(e))
            }, false)
        tries += 1
      }
      last
    }

    val indices = 0 until nJobs
    val outcomes: Seq[(Int, (Try[M], Boolean))] =
      if (parallel) {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(
          Future.sequence(indices.map(i => Future(i -> attempt(i)))), Duration.Inf)
      } else indices.map(i => i -> attempt(i))

    BagResult(
      outcomes.collect { case (_, (Success(m), _)) => m },
      outcomes.collect { case (i, (Failure(e), _)) => (i, e) },
      outcomes.collect { case (i, (_, true)) => i })
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
