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
  * CROSS-PROCESS publication is atomic-rename: a builder writes into a
  * process-unique temp dir under the root and renames it into place
  * (`Files.move` ATOMIC_MOVE). The first rename wins; a loser discards its
  * temp build and reads the winner's complete artifact. A stage directory
  * therefore only ever EXISTS complete — no reader can observe a
  * half-written or mid-overwrite stage, which the previous
  * `mode("overwrite")`-in-place protocol could not guarantee across
  * processes (overwrite deletes the target first; a concurrent cold start
  * could read the gap, or interleave part files from two jobs). The in-JVM
  * per-key locks remain purely an efficiency layer — they stop same-process
  * duplicate builds; correctness never depends on them. On an object store
  * without atomic directory rename the same protocol needs the store's
  * conditional-put/commit primitive (e.g. an S3 committer); the rename form
  * here is correct for the POSIX mounts local/NFS/Lustre roots are.
  *
  * STALENESS: the release token guards against cross-release reuse; within
  * a release, inputs are assumed IMMUTABLE at a given path (the object-store
  * contract a production pipeline already has — data regeneration lands at a
  * new snapshot path). As a cheap tripwire for the local/dev case where that
  * assumption breaks silently (testdata regenerated in place), the stage key
  * folds in the source directory's mtime: regenerating the input directory
  * re-keys every stage built from it, so stale parquet is never served for
  * refreshed inputs. Re-keying is paired with garbage collection: every
  * published stage carries a `_GRAFT_KEY` file recording its (name, srcDir,
  * mtime) triple, and [[enableAt]] sweeps stage dirs whose recorded mtime no
  * longer matches the live source — a persistent root does not accumulate
  * one orphan dir per in-place regeneration. KNOWN BLIND SPOT: directory
  * mtime only moves on entry create/delete, so rewriting file CONTENTS
  * inside an existing subdirectory (e.g. overwriting part files without
  * recreating `documents.parquet/`) leaves both the key and the sweep
  * untouched and serves stale parquet. Content-level mutation detection is a
  * data catalog's job (snapshot paths / table versions), not a stage
  * cache's — regenerate at a new path, or clear the root.
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
  // Per-thread stack of nested-build accumulators: a stage whose builder
  // requests another stage (d16_clusters' builder requests
  // d16_verified_pairs) runs the child's build INSIDE its own timer; each
  // frame accumulates the inclusive spans of builds executed beneath it so
  // the enclosing build can record exclusive self time.
  private val nestedFrames = new ThreadLocal[java.util.ArrayDeque[java.lang.Double]] {
    override def initialValue() = new java.util.ArrayDeque[java.lang.Double]()
  }
  private val TokenFile = "_GRAFT_TOKEN"
  private val KeyFile = "_GRAFT_KEY"

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
    // First stamp is EXCLUSIVE (CREATE_NEW): two cold processes racing to
    // claim a fresh root cannot both think they stamped it — the loser falls
    // through to the read-and-compare path and is admitted only if the
    // winner's token matches its own.
    val existing: String =
      try {
        Files.write(tf.toPath, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        token
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          new String(Files.readAllBytes(tf.toPath), "UTF-8")
      }
    if (existing != token)
      throw new IllegalStateException(
        s"Materialize root ${rootDir.getAbsolutePath} is stamped with token " +
          s"'$existing' but this run is '$token' — stale stage artifacts from " +
          "another release; point at a fresh root or clear this one.")
    sweepStale(rootDir)
    builds.clear()
    root = Some(rootDir)
  }

  /** GC for a persistent root: delete stage dirs whose recorded source mtime
    * no longer matches the live source directory (the in-place-regeneration
    * tripwire re-keys them, so they can never be read again — pure litter),
    * and crashed builders' `.build_*` temp dirs older than an hour (a LIVE
    * concurrent process's build is younger than that; non-crash paths clean
    * their own tmp in [[buildAndPublish]]'s finally). Stage dirs without a
    * `_GRAFT_KEY` (another writer's, or pre-key-file builds) are left alone —
    * the token check already scoped the root to this release.
    */
  private def sweepStale(rootDir: java.io.File): Unit = {
    val kids = rootDir.listFiles()
    if (kids == null) return
    kids.foreach { d =>
      if (d.isDirectory) {
        val kf = new java.io.File(d, KeyFile)
        if (kf.exists()) {
          val stale = try {
            val lines = Files.readAllLines(kf.toPath)
            lines.size >= 3 && new java.io.File(lines.get(1)).lastModified() != lines.get(2).toLong
          } catch { case scala.util.control.NonFatal(_) => false }
          // Grace window (round-15 ADVICE fix): a stage published within
          // the last hour may still be read by a concurrently RUNNING
          // process whose DataFrames were constructed before the source
          // regeneration — deleting it mid-run turns that process's lazy
          // actions into FileNotFoundExceptions. Stale dirs older than the
          // window are safe litter (the re-keyed readers can never resolve
          // them); younger ones are left for the next enableAt sweep.
          if (stale &&
              System.currentTimeMillis() - d.lastModified() > 60L * 60 * 1000)
            deleteRecursively(d)
        } else if (d.getName.startsWith(".build_") &&
            System.currentTimeMillis() - d.lastModified() > 60L * 60 * 1000) {
          deleteRecursively(d)
        }
      }
    }
  }

  /** Turn sharing off (tests that pin UNSHARED plan shapes rely on the
    * default-off state; this restores it after an enabled block).
    */
  def disable(): Unit = synchronized { root = None }

  def enabled: Boolean = root.isDefined

  /** One-time build wall-clock per `name@srcDir`, seconds — EXCLUSIVE
    * (self) time: a build that triggers a nested stage build records its
    * own cost NET of the child's, the child records its own row, and the
    * map's values sum to true build wall with no double counting.
    * (Round 14: previously inclusive — the d16_clusters row carried the
    * whole pairs build whenever the cluster stage was requested first,
    * which is run-shape-dependent and produced the r13 "85.6 s
    * propagation" misreading; exclusive rows are comparable across runs.)
    *
    * SAME-THREAD ASSUMPTION (round-15 ADVICE note): the exclusive
    * attribution rides a ThreadLocal frame stack, so it is correct only
    * while nested stage builds execute on the REQUESTING thread — which
    * every current builder does (table() runs the child build inside the
    * parent's call). A future builder that materializes a child on another
    * thread, or blocks on another thread's in-flight build via the key
    * lock, would charge that wall to its own row, silently reintroducing
    * the inclusive double-counting this design removed.
    */
  def buildCosts: Map[String, Double] = builds.toMap

  private def slug(s: String) = s.replaceAll("[^A-Za-z0-9._-]", "_")

  /** Directory name for a stage: readable slugs PLUS a hash of the raw
    * (name, srcDir, srcDir-mtime) triple. slug() is lossy ('/' and '_' both
    * slug to '_', and the '__' separator is itself producible), so the
    * hash — computed on a length-prefixed encoding, injective by
    * construction since the prefix delimits `name` exactly — is what makes
    * the mapping collision free; the slugs are only for humans reading the
    * root. The mtime term is the in-place-regeneration tripwire documented
    * above (one stat per table() call; 0 for a nonexistent path).
    */
  private def stageDirName(name: String, srcDir: String, mtime: Long): String = {
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"${name.length}:$name$srcDir@$mtime"))
    s"${slug(name)}__${slug(srcDir)}__$h"
  }

  /** A stage directory is complete iff it exists — publication is atomic
    * rename, so existence implies the full artifact. The _SUCCESS check is
    * defense-in-depth against a root populated by some OTHER writer.
    */
  private def complete(dir: java.io.File): Boolean =
    new java.io.File(dir, "_SUCCESS").exists()

  private def deleteRecursively(f: java.io.File): Unit = {
    val fs = f.listFiles()
    if (fs != null) fs.foreach(deleteRecursively)
    f.delete()
    ()
  }

  /** Build `build` into a process-unique temp dir under `root` and atomic-
    * rename it to `target`. Returns build seconds when this call published,
    * None when another builder (thread OR process) won the race — in which
    * case `target` is the winner's complete artifact. Package-visible so the
    * spec can drive two racing builders through the cross-process path
    * directly (bypassing the in-JVM per-key lock, exactly the situation two
    * cold processes on one shared root are in).
    */
  private[graft] def buildAndPublish(
      root: java.io.File, target: java.io.File, dirName: String,
      keyRecord: Option[String] = None)(
      build: => DataFrame): Option[Double] = {
    if (complete(target)) return None
    val tmp = new java.io.File(
      root, s".build_${dirName}_${java.util.UUID.randomUUID().toString.take(12)}")
    val t0 = System.nanoTime()
    var published = false
    // The finally is the no-litter guarantee: whenever THIS builder did not
    // rename tmp into place — lost the race, OR the parquet write / key-file
    // write itself threw — the partial temp dir is removed rather than
    // accumulating forever under a persistent shared root.
    try {
      build.write.mode("overwrite").parquet(tmp.getAbsolutePath)
      keyRecord.foreach { rec =>
        Files.write(new java.io.File(tmp, KeyFile).toPath, rec.getBytes("UTF-8"))
        ()
      }
      try {
        Files.move(tmp.toPath, target.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        published = true
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        // Another builder renamed first (target now exists): rename of a dir
        // onto an existing non-empty dir fails — POSIX surfaces ENOTEMPTY /
        // EEXIST, which the JDK maps to DirectoryNotEmptyException /
        // FileAlreadyExistsException OR (observed on Linux for the ATOMIC_MOVE
        // path) a plain FileSystemException carrying the errno text. So: on
        // ANY FileSystemException, lost-the-race iff the target is now a
        // complete published stage — then drop our build and read the
        // winner's; a failure with no complete winner is a real error.
        case e: java.nio.file.FileSystemException =>
          if (complete(target)) None
          else throw e
      }
    } finally {
      if (!published && tmp.exists()) deleteRecursively(tmp)
    }
  }

  /** The stage named `name` over inputs from `srcDir`: built (and written)
    * exactly once per enabled run, read thereafter; just `build` when
    * sharing is off. The builder executes EAGERLY on the build path (the
    * parquet write runs inside this call), so a caller can force
    * materialization by calling and discarding. Distinct stage keys build
    * concurrently; same-key requests serialize on a per-key lock (in-JVM
    * efficiency); cross-process races are settled by [[buildAndPublish]]'s
    * atomic rename.
    */
  def table(spark: SparkSession, name: String, srcDir: String)(build: => DataFrame): DataFrame =
    root match {
      case None => build
      case Some(r) =>
        val mtime = new java.io.File(srcDir).lastModified()
        val dirName = stageDirName(name, srcDir, mtime)
        val dir = new java.io.File(r, dirName)
        if (!complete(dir)) {
          // Invariant guard: no stage builder may run under a -c iteration
          // cap. No CURRENT builder consults IterationBudget, but if an
          // iterative builder were ever materialized, a capped run would
          // publish capped artifacts that later UNCAPPED runs (same key!)
          // silently read as correct. Enforced here, not just assumed.
          require(graft.core.IterationBudget.cap.isEmpty,
            s"Materialize: refusing to build shared stage '$name' under a -c " +
              "iteration cap — capped runs must not publish shared artifacts " +
              "(the stage key does not include the cap)")
          keyLocks.getOrElseUpdate(dirName, new Object).synchronized {
            // EXCLUSIVE attribution (see buildCosts): push a fresh nested-
            // time accumulator for the span of this build; children add
            // their inclusive spans to it; this build records its own time
            // net of them and charges its full span to ITS parent frame.
            val frames = nestedFrames.get()
            frames.push(0.0)
            var res: Option[Double] = None
            try {
              res = buildAndPublish(r, dir, dirName,
                Some(s"$name\n$srcDir\n$mtime\n"))(build)
            } finally {
              val childSecs: Double = frames.pop()
              res match {
                case Some(secs) =>
                  builds(s"$name@$srcDir") = secs - childSecs
                  if (!frames.isEmpty) frames.push(frames.pop() + secs)
                case None =>
                  // lost the race (or threw): our own wall is recorded
                  // nowhere, but child rows we DID execute sit inside the
                  // ancestor's timer and must still be subtracted there
                  if (!frames.isEmpty) frames.push(frames.pop() + childSecs)
              }
            }
          }
        }
        spark.read.parquet(dir.getAbsolutePath)
    }
}
