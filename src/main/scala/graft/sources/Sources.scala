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

  /** The engine's native columnar source. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
