package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-scoped shared-stage materialization — the write-once-parquet layer a
  * production pipeline puts between its stages, made available to the
  * declared query suite.
  *
  * Six declared queries re-run three upstream chains wholesale: g3/g4 replay
  * d16's full LSH+verify pair generation; p4/p5/p9/p10/p12 replay p1's
  * disposition chain (p5/p12 additionally replay d9's contamination scan;
  * p9/p10 share one kept-corpus strip). Per-query isolation is the right
  * CORRECTNESS contract — every query stays a standalone function of
  * (session, sfDir) — but it is the wrong execution model for a pipeline
  * run that executes many of them: a deployment materializes each stage's
  * output once and downstream stages read it, which is also how the same
  * chains avoid recomputation on a 1000-executor cluster (stage outputs on
  * the object store, not lineage re-execution).
  *
  * This object is that layer, opt-in and run-scoped:
  *   - DISABLED (the default, and always the case for plain library
  *     callers): [[table]] is the identity — the builder composes lazily
  *     into the caller's plan exactly as before. Zero behavior change.
  *   - ENABLED ([[enable]]; Verify/Bench turn it on for their own run): the
  *     first request for a stage builds it ONCE and writes parquet under a
  *     fresh per-process temp root; every later request — from any query in
  *     the run — reads the parquet. Keys include the source dir, so
  *     sf0.001/0.01/0.1 never cross-contaminate, and the root is created
  *     per JVM, so a stale artifact from an older code version can never
  *     satisfy a read.
  *
  * Correctness is unchanged by construction: the builder is the exact frame
  * the query would have computed, parquet round-trips every type the stages
  * use (long/int/double/string/boolean, nullable included), and all
  * consumers treat the frames as unordered relations. The oracle gate runs
  * with sharing ENABLED (Verify), so that claim is executable, not prose.
  *
  * Build costs are recorded ([[buildCosts]]) so Bench can publish them: the
  * one-time stage builds are real work and appear in the bench line's
  * "shared" block and its headline total rather than vanishing.
  */
object Materialize {
  @volatile private var root: Option[java.io.File] = None
  private val builds = scala.collection.concurrent.TrieMap.empty[String, Double]

  /** Turn sharing on for this JVM (idempotent). The root is a fresh temp
    * dir per process — run-scoped by construction.
    */
  def enable(): Unit = synchronized {
    if (root.isEmpty)
      root = Some(Files.createTempDirectory("graft_stage_").toFile)
  }

  /** Turn sharing off (tests that pin UNSHARED plan shapes rely on the
    * default-off state; this restores it after an enabled block).
    */
  def disable(): Unit = synchronized { root = None }

  def enabled: Boolean = root.isDefined

  /** One-time build wall-clock per `name@srcDir`, seconds. */
  def buildCosts: Map[String, Double] = builds.toMap

  private def slug(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** The stage named `name` over inputs from `srcDir`: built (and written)
    * exactly once per enabled run, read thereafter; just `build` when
    * sharing is off. The builder executes EAGERLY on the build path (the
    * parquet write runs inside this call), so a caller can force
    * materialization by calling and discarding.
    */
  def table(spark: SparkSession, name: String, srcDir: String)(build: => DataFrame): DataFrame =
    root match {
      case None => build
      case Some(r) =>
        val dir = new java.io.File(r, s"${slug(name)}__${slug(srcDir)}")
        synchronized {
          if (!new java.io.File(dir, "_SUCCESS").exists()) {
            val t0 = System.nanoTime()
            build.write.mode("overwrite").parquet(dir.getAbsolutePath)
            builds(s"$name@$srcDir") = (System.nanoTime() - t0) / 1e9
          }
        }
        spark.read.parquet(dir.getAbsolutePath)
    }
}
