package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** d11: most-duplicated n-gram spans — the memorization-risk report of the
  * dedup family: which exact word-3-gram spans recur across the most
  * documents (public "deduplicating training data" analyses report exactly
  * this table; it is also the triage view for d9's contamination hits).
  *
  * Two phases, both shingle-HASH keyed (one md5 per token, no shingle
  * strings in the wide path — d2/d4's scale argument):
  *
  *   1. span mining: per-doc DISTINCT hashed shingles (so a doc voting
  *      twice for its own repeated span doesn't inflate cross-doc counts)
  *      → explode → count docs per hash (map-side partial) → top-k by
  *      (ndocs desc, hash asc), a TakeOrdered, never a global sort;
  *   2. text recovery: ONLY the k winning hashes need their span text —
  *      re-scan with positionally-zipped (string shingle, hash) pairs,
  *      broadcast-join the k winners, min(text) per hash (deterministic
  *      under the ~2^-62 hash-collision case). The corpus-wide string
  *      shingles exist only in this projection and only k rows survive the
  *      broadcast join; nothing string-keyed ever shuffles.
  *
  * The tokenized frame (toks + token hashes) is computed once and persisted
  * so the two phases share one tokenize+md5 pass; at corpus scale the
  * recompute-per-phase tradeoff flips (cache bytes >> recompute cost) and
  * the persist simply drops.
  */
object D11DupSpans extends GraftQuery {
  val name = "d11_dup_spans"
  val describe = "top-20 most cross-doc-duplicated 3-gram spans, hash-mined + text-recovered"

  private val k = 20
  private val n = 3

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val base = graft.CacheScope.persisted(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          TextOps.tokenHashes(col("toks")).as("ht")))
    val top = base
      .select(col("doc_id"),
        explode(array_distinct(TextOps.shingleHashes(col("ht"), n))).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("ndocs"))
      .orderBy(col("ndocs").desc, col("h").asc)
      .limit(k)
    base
      .select(explode(arrays_zip(
        TextOps.shingles(col("toks"), n),
        TextOps.shingleHashes(col("ht"), n))).as("z"))
      .select(col("z.0").as("sh_text"), col("z.1").as("h"))
      .join(broadcast(top), "h")
      .groupBy(col("h"), col("ndocs"))
      .agg(min(col("sh_text")).as("shingle"))
      .select(col("h"), col("shingle"), col("ndocs"))
  }

  val oracle = Some(
    s"""WITH tk AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS toks FROM documents),
       |th AS (SELECT doc_id, toks, ${TextOps.tokenHashesSql("toks")} AS ht FROM tk),
       |hs AS (SELECT doc_id, unnest(list_distinct(${TextOps.shingleHashesSql("ht", n)})) AS h FROM th),
       |top AS (
       |  SELECT h, count(*) AS ndocs FROM hs GROUP BY h
       |  ORDER BY ndocs DESC, h ASC LIMIT $k),
       |pairs AS (
       |  SELECT unnest(${TextOps.shinglesSql("toks", n)}) AS sh_text,
       |         unnest(${TextOps.shingleHashesSql("ht", n)}) AS h
       |  FROM th)
       |SELECT t.h, min(p.sh_text) AS shingle, t.ndocs
       |FROM top t JOIN pairs p ON p.h = t.h
       |GROUP BY t.h, t.ndocs""".stripMargin)
}
