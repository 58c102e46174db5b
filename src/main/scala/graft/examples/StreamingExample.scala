package graft.examples

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Runnable example: drive the streaming windowed aggregation AND the
  * stateless document quality gate from real file sources (parquet files
  * landing in a directory — the standard ingestion pattern), not a test
  * harness stream.
  */
object StreamingExample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val landing = Files.createTempDirectory("graft_stream_landing")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"

    // Schema comes from the parquet footer itself so the stream follows the
    // generator's encoding (it changed nanos→micros once already); the same
    // ts normalization as Tables.events then yields the stable TimestampType
    // contract regardless of which encoding landed.
    val rawSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(rawSchema).parquet(landing.toString)
    val events = rawSchema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }

    val q = EventStream.windowedAgg(events).writeStream
      .format("memory").queryName("windowed").outputMode("complete").start()

    // Documents land in their own directory and flow through the stateless
    // quality gate — no watermark, no state store; the stream is just the
    // batch expressions applied row by row as files arrive.
    val docLanding = Files.createTempDirectory("graft_stream_docs")
    // Schema derived from the table itself (no nanos workaround needed here,
    // unlike events above) — a hand-rolled copy would drift silently if the
    // generator ever changed a column.
    val docSchema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val docs = spark.readStream.schema(docSchema).parquet(docLanding.toString)
    val gate = EventStream.qualityGate(docs)
      .filter(!col("flagged")).select(col("doc_id"))
      .writeStream.format("memory").queryName("gated").outputMode("append").start()

    // Simulate files arriving in the landing directories.
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      landing.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(Paths.get(s"$sfDir/documents.parquet"),
      docLanding.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    gate.processAllAvailable()
    val n = spark.table("windowed").count()
    val top = spark.table("windowed").orderBy(col("n_events").desc).limit(1).collect()(0)
    val passed = spark.table("gated").count()
    println(s"DRIVE-STREAM windows=$n top=${top.mkString(",")} gate_passed=$passed")
    gate.stop()
    q.stop()
    spark.stop()
  }
}
