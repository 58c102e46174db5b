package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS); fixed at session build so read
      // behavior never depends on query execution order (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE: ON — Spark 4's default, kept deliberately (SURVEY §4 "AQE
      // decision"): every oracle gate and bench number is certified under
      // adaptive execution (runtime coalescing + skew-join splitting), which
      // composes with the engine's explicit salting/broadcast choices. The
      // knob exists so the whole gate can be re-run with AQE OFF in one
      // invocation (SPARK_GRAFT_AQE=false) — proving no query DEPENDS on
      // adaptive rewrites for correctness.
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Shared-stage materialization (graft.Materialize): the run-scoped
    // write-once parquet layer between composed pipeline stages. Verify
    // runs WITH it on by default — so the oracle gate certifies the shared
    // mode, not just per-query isolation. SPARK_GRAFT_SHARED=none restores
    // fully isolated per-query execution.
    if (sys.env.getOrElse("SPARK_GRAFT_SHARED", "on") != "none") Materialize.enable()
    new java.io.File(outDir).mkdirs()
    // Per-query watchdog: a single hung query must not stall the whole
    // round. The job group lets the watchdog cancel the stuck Spark jobs so
    // their resources free up before the next query runs.
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT_SEC", "600").toLong
    // Same restriction knob Bench has, for local iteration on one query;
    // the driver leaves it unset and always dumps the full suite.
    val selected = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(csv) =>
        val want = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        SparkEntry.queries.filter { case (n, _) => want(n) }
      case None => SparkEntry.queries
    }
    // A crashed query must still leave a result dir: the driver's comparer
    // enumerates the dirs that exist, so a query that writes nothing silently
    // drops out of CORRECTNESS_r{N}.json (round 7 lost 11 entries this way
    // and the artifact read 96/97 green). On failure we write a one-row
    // parquet whose single `__graft_error__` column carries the message —
    // the driver then emits a visibly-red entry (schema/rows mismatch) for
    // every registered query instead of omitting it, and the parquet itself
    // documents the cause. errors.json aggregates the reasons for humans.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def writeError(name: String, msg: String): Unit =
      try {
        import spark.implicits._
        Seq(msg).toDF("__graft_error__").coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name: error-marker write failed: ${e.getMessage}")
      }
    selected.foreach { case (name, fn) =>
      val task = new java.util.concurrent.FutureTask[Unit](() =>
        try {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } finally spark.sparkContext.clearJobGroup())
      val th = new Thread(task, s"verify-$name")
      th.setDaemon(true)
      th.start()
      try task.get(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          // Interrupt the driver thread AND bar future jobs of the group:
          // plain cancelJobGroup only kills currently-active jobs, so a
          // multi-job query timing out between jobs (or hung driver-side)
          // would keep submitting work for the rest of the round.
          task.cancel(true)
          spark.sparkContext.cancelJobGroupAndFutureJobs(name)
          // Wait (bounded) for the cancelled writer thread to actually exit
          // before writing the error marker: cancel() is asynchronous, and a
          // zombie overwrite-mode writer racing on $outDir/$name could delete
          // the marker during its own overwrite-prep/abort cleanup —
          // reproducing the silent-drop this marker exists to prevent.
          th.join(30000L)
          if (th.isAlive)
            System.err.println(
              s"[verify] $name: cancelled writer still alive after 30s; " +
              "error marker may race with its cleanup")
          val msg = s"timeout after ${timeoutSec}s"
          System.err.println(s"[verify] $name failed: $msg")
          errors(name) = msg
          writeError(name, msg)
        case e: Throwable =>
          val cause = Option(e.getCause).getOrElse(e)
          val msg = s"${cause.getClass.getSimpleName}: ${cause.getMessage}"
          System.err.println(s"[verify] $name failed: $msg")
          errors(name) = msg
          writeError(name, msg)
      }
      // Queries may persist intermediates (LSH band frames); drop them so
      // no query's cache lingers into (or influences) the next one.
      // clearCache() evicts SQL-cache ENTRIES too — the RDD sweep alone
      // leaves CacheManager mappings that silently rewrite later identical
      // plan fragments onto stale caches (see Bench.exec).
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
  }
}
