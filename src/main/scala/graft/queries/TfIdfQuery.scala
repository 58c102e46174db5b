package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** t10: per-document TF-IDF keyword extraction — the canonical corpus-
  * statistics operator a training-data pipeline runs for topic tagging,
  * quality weighting and dedup features: for every document, the top-3
  * terms by tf·idf with sklearn-style smoothed idf
  * (idf = ln((N+1)/(df+1)) + 1, so unseen/ubiquitous terms stay positive
  * and bounded).
  *
  * Scale shape: three keyed shuffles, all hash-partitioned with map-side
  * partial aggregation — (doc_id, term) term counts, term-keyed document
  * frequencies, and the per-document ranking window over that document's
  * own DISTINCT terms (bounded by vocabulary per doc, never corpus-wide;
  * no global sort anywhere). The corpus size N is one broadcast row (the
  * t9 pattern); the df side of the term join is bounded by vocabulary, not
  * document count, and AQE broadcasts it when it fits.
  *
  * Cross-engine determinism: tf/df/N are exact integers; ln is the one
  * transcendental (same libm parity every exp/log in the suite relies on —
  * q3/t9 precedent) and the score is ROUNDED to 6 decimals BEFORE ranking,
  * with ties broken by term, so rank boundaries cannot sit on a last-ulp
  * disagreement.
  */
object T10TfIdf extends GraftQuery {
  val name = "t10_tfidf"
  val describe = "per-doc top-3 TF-IDF terms (smoothed idf, rank on rounded score)"

  private val topK = 3

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    // Unlike the md5-hashing dedup frames (d2/d3), the token frame is NOT
    // worth caching here: tokens are one cheap regex pass and t10's cost
    // lives in the joins/window (measured 1.00 s persisted vs 0.98 inline).
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val occ = docs.select(col("doc_id"), explode(col("toks")).as("term"))
    val tf = occ.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val score = round(
      col("tf") * (log((col("n") + 1.0) / (col("df") + 1.0)) + 1.0), 6)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), score.as("tfidf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  val oracle = Some(
    s"""WITH tok AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents),
       |occ AS (SELECT doc_id, unnest(toks) AS term FROM tok),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM occ GROUP BY doc_id, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n FROM tok),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |         round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT doc_id, term, tfidf,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= $topK""".stripMargin)
}
