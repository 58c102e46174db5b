package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Portable
import graft.operators.TextOps

/** t6: vocabulary building — global token frequencies, top 50 by (count
  * desc, token asc). The vocab step of any tokenizer-training pipeline:
  * explode + count (map-side partial per token) + TakeOrderedAndProject.
  * The full-vocabulary variant is the same plan minus the limit.
  */
object T6Vocab extends GraftQuery {
  val name = "t6_vocab"
  val describe = "token vocabulary: global frequencies, deterministic top-50"

  private val k = 50

  def run(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  val oracle = Some(
    s"""SELECT token, count(*) AS freq
       |FROM (SELECT unnest(${TextOps.tokensSql("text")}) AS token FROM documents)
       |GROUP BY token
       |ORDER BY freq DESC, token ASC
       |LIMIT $k""".stripMargin)
}

/** s3: deterministic stratified sampling — k documents per language, chosen
  * by hash rank (every executor can recompute membership from the row
  * alone; no global state, no RNG). The standard down-sampling step for
  * balancing a training corpus across strata.
  */
object S3StratifiedSample extends GraftQuery {
  val name = "s3_stratified_sample"
  val describe = "deterministic k-per-language sample via portable hash ranking"

  private val perStratum = 20

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(Portable.hash60(concat(lit("samp:"), col("doc_id").cast("string"))).asc,
        col("doc_id").asc)
    Tables.documents(spark, sfDir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perStratum)
      .select(col("lang"), col("rk"), col("doc_id"))
  }

  val oracle = Some(
    s"""SELECT lang, rk, doc_id FROM (
       |  SELECT lang, doc_id,
       |         row_number() OVER (
       |           PARTITION BY lang
       |           ORDER BY ${Portable.hash60Sql("'samp:' || CAST(doc_id AS VARCHAR)")} ASC, doc_id ASC) AS rk
       |  FROM documents)
       |WHERE rk <= $perStratum""".stripMargin)
}

/** v1: per-label embedding centroids — the vector aggregation shape shared
  * by k-means accumulation and class-prototype computation, fully
  * declarative: 64 per-dimension averages in one partial+final aggregate
  * (the shuffle carries labels × 64 doubles, constant in data size).
  */
object V1LabelCentroids extends GraftQuery {
  val name = "v1_label_centroids"
  val describe = "per-label mean embedding (64 per-dim averages, one aggregate pass)"

  private val d = Embeddings.dims

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val avgs = (0 until d).map(i =>
      round(avg(element_at(col("embedding"), i + 1).cast("double")), 6).as(s"c$i"))
    Tables.embeddings(spark, sfDir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), avgs: _*)
  }

  val oracle = {
    val avgs = (0 until d)
      .map(i => s"round(avg(CAST(embedding[${i + 1}] AS DOUBLE)), 6) AS c$i")
      .mkString(",\n       ")
    Some(
      s"""SELECT label, count(*) AS n,
         |       $avgs
         |FROM embeddings
         |GROUP BY label""".stripMargin)
  }
}
