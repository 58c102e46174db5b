package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pluggable table-source format — the engine's analogue of the reference's
  * `-inputformat` reflection wiring (guagua-mapreduce/.../GuaguaOptionsParser.java:190-191,
  * GuaguaMapReduceClient.java:471-487): a job can swap how its input
  * directory is decoded without touching any computable.
  *
  * A format decodes ONE named table from a data directory. Implementations
  * must have a public no-arg constructor when loaded by name via
  * [[graft.Cli]] (`-inputformat <class>`), exactly like Hadoop input
  * formats. Registration is PER-DIRECTORY ([[graft.Tables.registerFormat]]):
  * the format is a property of the data, not process-global state, so two
  * jobs over differently-encoded directories coexist in one session and
  * parallel test suites can't clobber each other.
  */
trait SourceFormat {
  def load(spark: SparkSession, dir: String, table: String): DataFrame
}

/** The engine's native columnar layout: `<dir>/<table>.parquet`. Default
  * for every directory with no registered format.
  */
final class ParquetFormat extends SourceFormat {
  override def load(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}
