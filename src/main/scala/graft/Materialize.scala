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
  *     first request for a stage builds it ONCE and writes parquet under the
  *     run root; every later request — from any query in the run — reads
  *     the parquet. Keys include the source dir, so sf0.001/0.01/0.1 never
  *     cross-contaminate.
  *
  * Two root modes:
  *   - [[enable]] (no args): a fresh temp dir per JVM — run-scoped by
  *     construction, so a stale artifact from an older code version can
  *     never satisfy a read. What Verify/Bench use.
  *   - [[enableAt]](root, token): an explicit root (the object-store mount
  *     in production) guarded by a token file. The token is the caller's
  *     code/release fingerprint: a root stamped with a DIFFERENT token is
  *     REJECTED with an error rather than silently served — stale stage
  *     parquet from an older pipeline release never reaches a reader. Same
  *     token → warm-cache reuse across processes, which is the point of an
  *     explicit root.
  *
  * Builds are locked PER STAGE KEY, not globally: two threads (or two
  * queries in a parallel driver) building DISTINCT stages proceed
  * concurrently; two requests for the SAME stage serialize and the loser
  * reads the winner's parquet.
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
  private val keyLocks = scala.collection.concurrent.TrieMap.empty[String, Object]
  private val TokenFile = "_GRAFT_TOKEN"

  /** Turn sharing on for this JVM (idempotent). The root is a fresh temp
    * dir per process — run-scoped by construction.
    */
  def enable(): Unit = synchronized {
    if (root.isEmpty) {
      builds.clear() // costs are RUN-scoped, like the root they describe
      root = Some(Files.createTempDirectory("graft_stage_").toFile)
    }
  }

  /** Turn sharing on over an EXPLICIT root (production: the object-store
    * mount). `token` identifies the code/release that owns the artifacts;
    * a root already stamped with a different token is rejected — reusing
    * stage parquet across releases is exactly the staleness the temp-dir
    * mode rules out by construction, so the explicit mode must rule it out
    * by check.
    */
  def enableAt(rootDir: java.io.File, token: String): Unit = synchronized {
    require(token.nonEmpty, "Materialize.enableAt: token must be non-empty")
    rootDir.mkdirs()
    val tf = new java.io.File(rootDir, TokenFile)
    if (tf.exists()) {
      val existing = new String(Files.readAllBytes(tf.toPath), "UTF-8")
      if (existing != token)
        throw new IllegalStateException(
          s"Materialize root ${rootDir.getAbsolutePath} is stamped with token " +
            s"'$existing' but this run is '$token' — stale stage artifacts from " +
            "another release; point at a fresh root or clear this one.")
    } else Files.write(tf.toPath, token.getBytes("UTF-8"))
    builds.clear()
    root = Some(rootDir)
  }

  /** Turn sharing off (tests that pin UNSHARED plan shapes rely on the
    * default-off state; this restores it after an enabled block).
    */
  def disable(): Unit = synchronized { root = None }

  def enabled: Boolean = root.isDefined

  /** One-time build wall-clock per `name@srcDir`, seconds. */
  def buildCosts: Map[String, Double] = builds.toMap

  private def slug(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Directory name for a stage: readable slugs PLUS a hash of the raw
    * (name, srcDir) pair. slug() is lossy ('/' and '_' both slug to '_',
    * and the '__' separator is itself producible), so the hash — computed
    * on a length-prefixed encoding, injective by construction since the
    * prefix delimits `name` exactly — is what makes the mapping collision
    * free; the slugs are only for humans reading the root.
    */
  private def stageDirName(name: String, srcDir: String): String = {
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"${name.length}:$name$srcDir"))
    s"${slug(name)}__${slug(srcDir)}__$h"
  }

  /** The stage named `name` over inputs from `srcDir`: built (and written)
    * exactly once per enabled run, read thereafter; just `build` when
    * sharing is off. The builder executes EAGERLY on the build path (the
    * parquet write runs inside this call), so a caller can force
    * materialization by calling and discarding. Distinct stage keys build
    * concurrently; same-key requests serialize on a per-key lock.
    */
  def table(spark: SparkSession, name: String, srcDir: String)(build: => DataFrame): DataFrame =
    root match {
      case None => build
      case Some(r) =>
        val dirName = stageDirName(name, srcDir)
        val dir = new java.io.File(r, dirName)
        keyLocks.getOrElseUpdate(dirName, new Object).synchronized {
          if (!new java.io.File(dir, "_SUCCESS").exists()) {
            val t0 = System.nanoTime()
            build.write.mode("overwrite").parquet(dir.getAbsolutePath)
            builds(s"$name@$srcDir") = (System.nanoTime() - t0) / 1e9
          }
        }
        spark.read.parquet(dir.getAbsolutePath)
    }
}
