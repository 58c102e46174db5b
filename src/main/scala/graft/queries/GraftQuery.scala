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

  def oracle: Option[String]
}
