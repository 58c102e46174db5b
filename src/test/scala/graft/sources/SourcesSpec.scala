package graft.sources

import java.nio.file.Files

import org.apache.hadoop.io.{BytesWritable, LongWritable, Text}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("B1: text source reads the reference sum fixtures (with line semantics)") {
    val ds = Sources.text(spark, getClass.getResource("/sum").getPath)
    assert(ds.collect().map(_.trim.toLong).sum == 15L)
  }

  test("B1: text source reads gzip-compressed files transparently (codec path)") {
    // The reference's line reader honors Hadoop compression codecs
    // (GuaguaLineRecordReader); Spark's text source inherits the same codec
    // factory, keyed off the .gz extension.
    val dir = Files.createTempDirectory("graft-gz")
    val f = dir.resolve("lines.txt.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(f))
    out.write("7\n11\n24\n".getBytes("UTF-8"))
    out.close()
    val ds = Sources.text(spark, dir.toString)
    assert(ds.collect().map(_.trim.toLong).sorted.toSeq == Seq(7L, 11L, 24L))
  }

  test("B2: SequenceFile as-text round-trips") {
    val dir = Files.createTempDirectory("graft-seq").resolve("data").toString
    val sc = spark.sparkContext
    sc.parallelize(Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")), 2)
      .map { case (k, v) => (new Text(k), new Text(v)) }
      .saveAsSequenceFile(dir)
    val got = Sources.sequenceAsText(spark, dir).collect().toMap
    assert(got == Map("k1" -> "v1", "k2" -> "v2", "k3" -> "v3"))
  }

  test("B2: SequenceFile as-binary round-trips byte-exactly") {
    val dir = Files.createTempDirectory("graft-seqb").resolve("data").toString
    val sc = spark.sparkContext
    val payloads = Seq(Array[Byte](1, 2, 3), Array[Byte](-1, 0, 127))
    sc.parallelize(payloads.zipWithIndex, 1)
      .map { case (b, i) => (new LongWritable(i.toLong), new BytesWritable(b)) }
      .saveAsSequenceFile(dir)
    val got = Sources.sequenceAsBinary(spark, dir).collect().map(_.toSeq).toSet
    assert(got == payloads.map(_.toSeq).toSet)
  }

  test("B2→C2: iterated sum runs over a SequenceFile source (reference parity)") {
    // The reference's sum example consumes SequenceFiles through
    // GuaguaSequenceRecordReader (guagua-examples SumWorker over seq input);
    // here the same pipeline is source → parse → Iterate kernel, and the
    // result must satisfy the reference recurrence s_i = P·s_{i-1} + X.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-seqsum").resolve("data").toString
    val sc = spark.sparkContext
    sc.parallelize((1L to 5L).map(i => (i, i.toString)), 2)
      .map { case (k, v) => (new Text(k.toString), new Text(v)) }
      .saveAsSequenceFile(dir)
    val values = Sources.sequenceAsText(spark, dir).map(_._2.toLong).repartition(2)
    val res = graft.operators.IterativeSum.run(values, maxIterations = 3, haltAbove = Long.MaxValue)
    assert(res.master == graft.operators.IterativeSum.closedForm(15L, 2, 3))
  }

  test("B1: delimited source parses pipe-separated numeric columns (kmeans fixture shape)") {
    val dir = Files.createTempDirectory("graft-psv")
    Files.writeString(dir.resolve("a.txt"), "1|2\n-2|-3\n4|5\n")
    val df = Sources.delimited(spark, dir.toString, sep = "|")
    assert(df.count() == 3)
    assert(df.schema.fields.forall(_.dataType.typeName == "integer"))
  }

  test("JSONL corpus source: explicit schema, malformed lines quarantined not dropped") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("shard-00.jsonl"),
      """{"doc_id": 1, "text": "a good document", "source": "srcA"}
        |{"doc_id": 2, "text": "another fine one", "source": "srcB"}
        |{not json at all
        |{"doc_id": 3, "text": "after the bad line", "source": "srcA"}
        |""".stripMargin)
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType).add("source", StringType)
    // Cached before inspection: Spark refuses queries that reference ONLY
    // the corrupt column of a raw JSON scan (see Sources.jsonl scaladoc).
    val df = Sources.jsonl(spark, dir.toString, schema).cache()
    val good = df.filter(col("_corrupt").isNull)
    val bad = df.filter(col("_corrupt").isNotNull)
    assert(good.count() == 3, "well-formed lines lost")
    assert(bad.count() == 1, "malformed line not quarantined")
    assert(bad.select("_corrupt").collect().head.getString(0).startsWith("{not json"),
      "quarantined payload should carry the raw line for inspection")
    assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("B2: SequenceFile with a user-defined Writable (the reference's raw flavor)") {
    // The reference hands raw Writables to the computable
    // (GuaguaSequenceRecordReader.java:52-76); the adapter's extract runs
    // inside the scan and materializes into plain values — several records
    // per split, so Hadoop's Writable-instance reuse would corrupt any
    // extract that kept the object instead of its fields.
    val dir = Files.createTempDirectory("graft-seqw")
    val file = new org.apache.hadoop.fs.Path(dir.resolve("part-0").toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val w = org.apache.hadoop.io.SequenceFile.createWriter(
      conf,
      org.apache.hadoop.io.SequenceFile.Writer.file(file),
      org.apache.hadoop.io.SequenceFile.Writer.keyClass(classOf[org.apache.hadoop.io.IntWritable]),
      org.apache.hadoop.io.SequenceFile.Writer.valueClass(classOf[PointWritable]))
    try (1 to 5).foreach { i =>
      w.append(new org.apache.hadoop.io.IntWritable(i), new PointWritable(i, i * i))
    } finally w.close()
    val got = Sources.sequenceWritable(
      spark, dir.toString,
      classOf[org.apache.hadoop.io.IntWritable],
      classOf[PointWritable]) { (k, v) => (k.get, v.x, v.y) }
      .collect().toSet
    assert(got == (1 to 5).map(i => (i, i, i * i)).toSet)
  }
}

/** Custom Writable for the raw-flavor test: instantiated by Hadoop's
  * ReflectionUtils inside the record reader, so it needs the public no-arg
  * constructor the Writable contract requires.
  */
class PointWritable(var x: Int, var y: Int)
    extends org.apache.hadoop.io.Writable {
  def this() = this(0, 0)
  override def write(out: java.io.DataOutput): Unit = {
    out.writeInt(x); out.writeInt(y)
  }
  override def readFields(in: java.io.DataInput): Unit = {
    x = in.readInt(); y = in.readInt()
  }
}
