package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pipeline: partition-batched decode emits typed features for every document") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val feats = Multimodal.pipeline(spark, docs).collect()
    assert(feats.length == docs.count())
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 16 && f.width < 16 + 1024)
      assert(f.height >= 16 && f.height < 16 + 1024)
      assert(f.n_frames >= 1 && f.n_frames <= 16)
      assert(f.mean_byte > 0 && f.mean_byte < 256)
    }
  }

  test("decode stub is deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val a = Multimodal.pipeline(spark, docs).collect().sortBy(_.doc_id)
    val b = Multimodal.pipeline(spark, docs.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("payload bytes equal UTF-8 text length for ASCII corpus") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    import org.apache.spark.sql.functions._
    val mismatch = Multimodal.pipeline(spark, docs).toDF()
      .join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")))
      .count()
    assert(mismatch == 0)
  }
}
