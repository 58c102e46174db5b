package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, parameterized query of the engine's declared surface
  * (SURVEY.md §2.F + the pipeline extensions). `run` is the Spark-first
  * implementation; `oracle` is the exact DuckDB SQL the driver checks it
  * against (None → driver falls back to a rows-only check).
  *
  * Contract: output column NAMES (and value formatting) must match the
  * oracle exactly — the driver sorts columns by name and hash-compares
  * canonicalized values. Floating-point aggregates are rounded explicitly on
  * BOTH sides so summation-order differences between engines cannot flip a
  * digit at the driver's 12-significant-digit canonicalization.
  */
trait GraftQuery {
  def name: String

  /** One-line description for SURVEY/README cross-referencing. */
  def describe: String

  def run(spark: SparkSession, sfDir: String): DataFrame

  /** [[run]] with the cache lifetime owned by the QUERY instead of the
    * caller: materialize through `sink`, then unpersist exactly the frames
    * this call pinned (d4/t8/t9/d9 persist intermediates that outlive the
    * returned plan). Snapshot-diff on RDD ids — caches the application held
    * before the call survive untouched, so a long-lived session can
    * interleave managed queries with its own cached state. Bench/Verify keep
    * their blanket sweep (they own the whole session); library callers get
    * this.
    */
  def runManaged[T](spark: SparkSession, sfDir: String)(sink: DataFrame => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try sink(run(spark, sfDir))
    finally spark.sparkContext.getPersistentRDDs
      .foreach { case (id, rdd) => if (!before.contains(id)) rdd.unpersist(false) }
  }

  def oracle: Option[String]
}
