package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CacheScope, Tables}
import graft.operators.TextOps

/** d14: minhash-estimator calibration — for every d2 candidate pair, the
  * signature-agreement ESTIMATE of Jaccard (fraction of the k minhash
  * components that agree; E[est] = J by the minhash property) next to the
  * EXACT shingle-set Jaccard d4 computes. d12 calibrates the cosine
  * threshold; this calibrates the estimator itself — how trustworthy d2's
  * signatures are at this k is what decides whether the verify stage (d4)
  * can ever be dropped at scale, and the answer should be read off this
  * table, not assumed.
  *
  * One hashed-shingle frame feeds all three consumers (signatures, band
  * join, exact verify) through the cache; the estimate is integer
  * comparisons over k columns; est values are exact multiples of 1/k
  * (binary-exact, no rounding hazard), the exact Jaccard rounds to 6 like
  * d4.
  */
object D14MinhashCalibration extends GraftQuery {
  val name = "d14_minhash_calibration"
  val describe = "estimated (signature-agreement) vs exact Jaccard for every d2 candidate pair"

  private val k = MinhashLsh.nHashes

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val shs = CacheScope.persisted(
      TextOps.shingleHashSets(Tables.documents(spark, sfDir)))
    val sig = TextOps.minhashSignaturesFromHashes(shs, k)
    val cand = MinhashLsh.candidatePairsFrom(shs)
    val agree = (0 until k).map(i =>
      when(col(s"sa.m$i") === col(s"sb.m$i"), 1).otherwise(0): org.apache.spark.sql.Column)
      .reduce(_ + _)
    val inter = size(array_intersect(col("a.shs"), col("b.shs")))
    val jac = inter.cast("double") /
      (size(col("a.shs")) + size(col("b.shs")) - inter).cast("double")
    cand
      .join(sig.alias("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sig.alias("sb"), col("doc_b") === col("sb.doc_id"))
      .join(shs.alias("a"), col("doc_a") === col("a.doc_id"))
      .join(shs.alias("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (agree.cast("double") / k).as("est_jaccard"),
        round(jac, 6).as("jaccard"))
  }

  val oracle = {
    val agree = (0 until k).map(i =>
      s"(CASE WHEN sa.m$i = sb.m$i THEN 1 ELSE 0 END)").mkString(" + ")
    Some(
      s"""WITH ${MinhashLsh.candidatePairsSql},
         |inter AS (
         |  SELECT c.doc_a, c.doc_b,
         |         len(list_intersect(a.shs, b.shs)) AS i,
         |         len(a.shs) AS na, len(b.shs) AS nb
         |  FROM cand c
         |  JOIN shs a ON c.doc_a = a.doc_id
         |  JOIN shs b ON c.doc_b = b.doc_id)
         |SELECT i2.doc_a, i2.doc_b,
         |       CAST($agree AS DOUBLE) / $k AS est_jaccard,
         |       round(CAST(i2.i AS DOUBLE) / (i2.na + i2.nb - i2.i), 6) AS jaccard
         |FROM inter i2
         |JOIN sig sa ON i2.doc_a = sa.doc_id
         |JOIN sig sb ON i2.doc_b = sb.doc_id""".stripMargin)
  }
}
