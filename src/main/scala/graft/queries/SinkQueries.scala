package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** FIXED per-query sink locations. A fresh createTempDirectory per run can
  * never be deleted eagerly (the returned DataFrame reads the directory
  * lazily, after `run` returns), so bench/verify loops — 3 reps × rounds ×
  * warm passes — used to orphan one directory per execution. A stable path
  * plus `mode("overwrite")` replaces the previous run's output instead of
  * accumulating beside it.
  */
private[queries] object SinkPaths {
  def dir(query: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), "graft-sinks", query)
    Files.createDirectories(p.getParent)
    p.toString
  }
}

/** Q8 (SURVEY §2.F): projection + filter + tagged parquet sink, round-tripped
  * — the reference's per-worker tagged-data dump
  * (kmeans/KMeansDataOutput.java:36-71) re-expressed as a distributed
  * columnar write instead of per-task side files.
  *
  * The filter and 3-column projection are pushed into the scan
  * (PushedFilters/ReadSchema in explain); the write is executor-parallel.
  * The oracle checks the data that came BACK from parquet, so the
  * round-trip itself (types, timestamp encoding) is under test.
  */
object Q8TaggedSink extends GraftQuery {
  val name = "q8_tagged_sink"
  val describe = "filter + projection + tagged parquet sink, round-tripped (B6 sink)"

  private val cutoff = "1995-06-01 00:00:00"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = SinkPaths.dir("q8_sink")
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit(cutoff).cast("timestamp"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        concat(
          when(col("l_quantity") >= 25, "H").otherwise("L"),
          when(col("l_discount") >= 0.05, "D").otherwise("N")).as("tag"))
      .write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  val oracle = Some(
    s"""SELECT l_orderkey, l_linenumber,
       |       (CASE WHEN l_quantity >= 25 THEN 'H' ELSE 'L' END ||
       |        CASE WHEN l_discount >= 0.05 THEN 'D' ELSE 'N' END) AS tag
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$cutoff'""".stripMargin)
}

/** Q19: the same tagged sink through ORC — the second columnar format a
  * warehouse-facing deployment needs (Spark's native ORC source; vectorized
  * reader, predicate pushdown and column pruning apply exactly as for
  * parquet). The round trip pins ORC's type encodings (BIGINT, INT, VARCHAR,
  * and the aggregate's DOUBLE) against the parquet-read oracle: the oracle
  * never sees the ORC bytes, so a lossy encode/decode would hash-mismatch.
  *
  * Different aggregate shape from q8 (grouped sums rather than row
  * projection) so the two sink queries also cover both write volumes: q8
  * writes O(rows), q19 writes O(groups).
  */
object Q19OrcSink extends GraftQuery {
  val name = "q19_orc_sink"
  val describe = "grouped aggregate written + read back through ORC (B5 sink family, second format)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = SinkPaths.dir("q19_orc")
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"),
        count(lit(1)).as("n"))
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
  }

  val oracle = Some(
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_price,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)
}

/** Q28: JSONL sink round-trip — the interchange format LLM corpora actually
  * ship as (The Pile, Dolma, C4 dumps, fine-tuning datasets: one JSON
  * object per line). Documents are written as JSON Lines and read back
  * under an EXPLICIT schema (production discipline: schema inference over
  * 100 TB is a full extra pass and a type-drift hazard), and the oracle
  * pins the reread data — doc text included via md5 — against the source
  * table, so JSON's escaping/encoding round-trip itself is under test (a
  * lossy escape of any character in any document flips the hash).
  *
  * Scale: the write is executor-parallel; uncompressed JSON Lines are
  * SPLITTABLE on read (each line self-contained), so the reread
  * parallelizes like any text source — the reason the format survives at
  * corpus scale despite being the least compact one (pair with zstd in
  * production; the codec rides `option("compression", ...)`).
  */
object Q28JsonlSink extends GraftQuery {
  val name = "q28_jsonl_sink"
  val describe = "JSONL corpus sink + schema-explicit reread, text md5-pinned (the LLM interchange format)"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = SinkPaths.dir("q28_jsonl")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
    docs.write.mode("overwrite").json(out)
    spark.read.schema(docs.schema).json(out)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
  }

  val oracle = Some(
    """SELECT doc_id, source, lang, n_chars, md5(text) AS text_md5
      |FROM documents""".stripMargin)
}

/** Q29: CSV sink round-trip — the tabular metadata-export format (quality
  * reports, datasheet tables, spreadsheet handoffs), completing the sink
  * matrix: parquet (q8), ORC (q19), partitioned (q20), JSONL (q28), CSV.
  * Written with header + RFC-4180-style quoting and reread under an
  * EXPLICIT schema (CSV carries no types at all — worse than JSON — so
  * schema-on-read is non-negotiable), document text md5-pinned through the
  * quote/escape cycle like q28 so a lossy escape flips the gate.
  *
  * Scale judgment, and why this is NOT the corpus interchange format: a
  * CSV field containing a newline must be quoted, and a quoted-newline CSV
  * is only parseable with `multiLine=true` — which makes each FILE one
  * split (the parser cannot resync mid-file), forfeiting the splittability
  * that q28's one-object-per-line layout keeps. Ship corpora as JSONL;
  * export TABLES (bounded, newline-free) as CSV — this query does the
  * latter and documents the cliff. CsvSinkSpec drives hostile text
  * (quotes, commas, newlines, the empty-vs-null distinction) through the
  * same option set to pin the round-trip policy.
  */
object Q29CsvSink extends GraftQuery {
  val name = "q29_csv_sink"
  val describe = "CSV sink + schema-explicit reread, text md5-pinned (tabular export; splittability cliff documented)"

  /** Write and read option sets — a round-trip is only as lossless as its
    * two sides agreeing on quote/escape/empty conventions, and the
    * empty-vs-null distinction is the trap (probed byte-level while
    * building this). The WRITER is fine by default: empty → `5,""`,
    * null → `6,` (bare). The READER is not: its default `nullValue` is the
    * empty string, and the nullValue comparison runs on the PARSED value —
    * so the quoted-empty field parses to "" and is then collapsed to null;
    * setting read `emptyValue` to "" is silently treated as unset (only a
    * non-empty sentinel takes effect, which would rewrite "" to the
    * sentinel — worse). The fix that works: move the READ-side nullValue
    * off the empty string to a value no real text carries (NUL). Then
    * `""` → "" (≠ NUL, survives) and the bare field → null at the parser
    * level. Residual caveat, documented rather than hidden: a text value
    * exactly equal to the lone NUL char would read as null — CSV
    * fundamentally cannot represent both null and its own nullValue
    * sentinel, one more reason q28's JSONL (which has a real `null`
    * token) is the corpus format and CSV is the TABLE-export format.
    * CsvSinkSpec holds the distinction through this option pair.
    */
  val csvWriteOptions: Map[String, String] = Map(
    "header" -> "true",
    "quote" -> "\"",
    "escape" -> "\"") // RFC 4180: quotes double inside quoted fields
  // multiLine is a READ-only option (embedded newlines inside quoted
  // fields); on write it is a silent no-op, so it belongs to the reader's
  // option set, not the writer's guarantee set.
  val csvReadOptions: Map[String, String] =
    csvWriteOptions + ("multiLine" -> "true") + ("nullValue" -> "\u0000")

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = SinkPaths.dir("q29_csv")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("text"))
    docs.write.mode("overwrite").options(csvWriteOptions).csv(out)
    spark.read.schema(docs.schema).options(csvReadOptions).csv(out)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        md5(col("text").cast("binary")).as("text_md5"))
  }

  val oracle = Some(
    """SELECT doc_id, source, lang, n_chars, md5(text) AS text_md5
      |FROM documents""".stripMargin)
}

/** Q20: Hive-partitioned sink + partition-PRUNED read — the layout that
  * makes 100 TB metadata-selective: documents written `partitionBy(source)`
  * (one directory per source), then read back with a source predicate. The
  * plan must prune at the DIRECTORY level (PartitionFilters in the scan,
  * pinned in PlanSpec) — a reader of one source never lists, opens, or
  * byte-scans the other sources' files, which is the difference between a
  * partition-key query costing O(selected partition) and O(corpus).
  *
  * The partition column round-trips through the directory NAME (written as
  * a path segment, re-derived by the reader), so the oracle also pins that
  * encode/decode. Output re-selects the original column order (a
  * partitioned write moves the partition column last in the file schema).
  */
object Q20PartitionedSink extends GraftQuery {
  val name = "q20_partitioned_sink"
  val describe = "partitionBy(source) sink + directory-pruned read of one partition"

  private[queries] val selected = "src3"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val out = SinkPaths.dir("q20_part")
    Tables.documents(spark, sfDir)
      .write.mode("overwrite").partitionBy("source").parquet(out)
    spark.read.parquet(out)
      .filter(col("source") === selected)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  val oracle = Some(
    s"""SELECT doc_id, source, lang, n_chars
       |FROM documents WHERE source = '$selected'""".stripMargin)
}
