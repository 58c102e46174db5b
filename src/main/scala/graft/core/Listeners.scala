package graft.core

import org.slf4j.LoggerFactory

/** Built-in [[IterationListener]]s — the Spark-native form of the
  * reference's DEFAULT SYSTEM INTERCEPTORS, which every guagua job gets
  * unless overridden (`GuaguaConstants.java:86-92`: MasterTimer,
  * GcMasterInterceptor, MemoryStatsMasterInterceptor + worker twins):
  *
  *   - [[Listeners.timing]]   ≙ `master/MasterTimer.java` — per-iteration and
  *     total wall clock;
  *   - [[Listeners.memory]]   ≙ `master/MemoryStatsMasterInterceptor.java` —
  *     driver heap used/committed per iteration;
  *   - [[Listeners.gc]]       ≙ `master/GcMasterInterceptor.java` — cumulative
  *     GC count/time delta per iteration (via the management beans, like the
  *     reference).
  *
  * Worker-side stats are Spark's own metrics system (task time, GC time,
  * peak memory per task in the UI/event log) — re-implementing the worker
  * twins would duplicate the platform, so only the master/driver side is
  * mirrored here. Compose them via `Iterate.run(listeners = ...)`; they
  * observe only — no effect on results.
  */
object Listeners {

  /** Per-iteration + total wall clock (MasterTimer.java semantics). The
    * sink is injectable for tests; default logs at INFO.
    */
  def timing[M](sink: String => Unit = defaultSink): IterationListener[M] =
    new IterationListener[M] {
      override def onIterationEnd(i: Int, m: M, ms: Long): Unit =
        sink(s"iteration $i: ${ms} ms")
      override def onComplete(r: IterationResult[M]): Unit =
        sink(s"completed ${r.iterations} iterations in ${r.elapsedMillis} ms" +
          (if (r.halted) " (halted)" else ""))
    }

  /** Driver heap used/committed per iteration
    * (MemoryStatsMasterInterceptor.java semantics).
    */
  def memory[M](sink: String => Unit = defaultSink): IterationListener[M] =
    new IterationListener[M] {
      private val mem = java.lang.management.ManagementFactory.getMemoryMXBean
      override def onIterationEnd(i: Int, m: M, ms: Long): Unit = {
        val h = mem.getHeapMemoryUsage
        sink(s"iteration $i: heap used ${h.getUsed >> 20} MB / committed ${h.getCommitted >> 20} MB")
      }
    }

  /** Cumulative GC count/time deltas per iteration
    * (GcMasterInterceptor.java semantics).
    */
  def gc[M](sink: String => Unit = defaultSink): IterationListener[M] =
    new IterationListener[M] {
      import scala.jdk.CollectionConverters._
      private def snapshot: (Long, Long) = {
        val beans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        (beans.map(b => math.max(0L, b.getCollectionCount)).sum,
          beans.map(b => math.max(0L, b.getCollectionTime)).sum)
      }
      private var last = (0L, 0L)
      override def onStart(total: Int): Unit = last = snapshot
      override def onIterationEnd(i: Int, m: M, ms: Long): Unit = {
        val now = snapshot
        sink(s"iteration $i: ${now._1 - last._1} GCs, ${now._2 - last._2} ms GC time")
        last = now
      }
    }

  private val log = LoggerFactory.getLogger("graft.core.Listeners")
  private def defaultSink(s: String): Unit = log.info(s)
}
