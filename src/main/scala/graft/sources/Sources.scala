package graft.sources

import org.apache.hadoop.io.{BytesWritable, LongWritable, Text}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Input sources matching the reference's record readers (SURVEY §2.B):
  *
  *   - B1 text lines (+transparent gzip/bzip2): `GuaguaLineRecordReader`
  *     (guagua-mapreduce/.../io/GuaguaLineRecordReader.java:57-127). Spark's
  *     text source applies the same Hadoop compression codecs and the same
  *     split-boundary line handling; small-file bin-packing ≙ the
  *     reference's combine-splits mode (GuaguaInputFormat.java:149-167) via
  *     `spark.sql.files.maxPartitionBytes` / `openCostInBytes`.
  *   - B2 SequenceFiles in the reference's three flavors: raw Writable,
  *     as-text, as-binary (GuaguaSequenceRecordReader.java:52-111).
  *
  * All return types feed either the relational surface (DataFrame) or the
  * iterate kernel (Dataset/RDD) directly.
  */
object Sources {

  /** B1: line records. Offsets (the reference's record keys) are an
    * implementation detail nobody's computables consumed; the line payload
    * is the record.
    */
  def text(spark: SparkSession, path: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(path)
  }

  /** B1 parsed: delimiter-split numeric columns (the shape every reference
    * example hand-parses in `load()`; schema-full instead of schema-less).
    */
  def delimited(
      spark: SparkSession,
      path: String,
      sep: String = "|"): DataFrame =
    spark.read.option("sep", sep).option("inferSchema", "true").csv(path)

  /** B2: SequenceFile as text key/value. */
  def sequenceAsText(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDS()
  }

  /** B2: SequenceFile as raw binary values (offset key dropped, as above). */
  def sequenceAsBinary(spark: SparkSession, path: String): RDD[Array[Byte]] =
    spark.sparkContext
      .sequenceFile(path, classOf[LongWritable], classOf[BytesWritable])
      .map { case (_, v) => java.util.Arrays.copyOf(v.getBytes, v.getLength) }

  /** B2: SequenceFile with the caller's OWN Writable key/value classes —
    * the reference's raw flavor, where the record reader hands the Writable
    * pair straight to the computable
    * (GuaguaSequenceRecordReader.java:52-76). `extract` runs inside the
    * scan and MUST materialize what it keeps into plain values: Hadoop
    * record readers reuse ONE Writable instance per split, so a closure
    * that stores the object itself would see every kept record mutate into
    * the split's last record. Forcing extraction into the signature makes
    * that materialization point exist — this one function is the "adapter
    * line" a custom-Writable user writes.
    */
  def sequenceWritable[
      K <: org.apache.hadoop.io.Writable,
      V <: org.apache.hadoop.io.Writable,
      T: scala.reflect.ClassTag](
      spark: SparkSession,
      path: String,
      keyClass: Class[K],
      valueClass: Class[V])(extract: (K, V) => T): RDD[T] =
    spark.sparkContext
      .sequenceFile(path, keyClass, valueClass)
      .map { case (k, v) => extract(k, v) }

  /** The engine's native columnar source. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines corpus source — the interchange format LLM training
    * corpora actually arrive in (one JSON document per line, usually
    * gzipped). Contract for unbounded dirty corpora:
    *
    *   - the schema is EXPLICIT (no sampling pass over 100 TB to infer it,
    *     and no silent schema drift between shards);
    *   - malformed lines are QUARANTINED, not fatal and not dropped:
    *     PERMISSIVE mode routes them to `corruptCol` with every declared
    *     column null, so the caller can count/inspect rejects
    *     (`jsonl(...).filter(col("_corrupt").isNotNull)`) — the same
    *     tolerance posture as the reference's empty-gzip-split drop
    *     (GuaguaInputFormat.java:131-144), but with the evidence kept.
    *     Spark refuses a query that references ONLY the corrupt column of
    *     a raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — callers
    *     auditing rejects alone should `.cache()` the parsed frame first;
    *   - compression codecs apply transparently as in [[text]].
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      corruptCol: String = "_corrupt"): DataFrame =
    spark.read
      .schema(schema.add(corruptCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
}
