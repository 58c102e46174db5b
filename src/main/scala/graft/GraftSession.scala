package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: registers every test-data table as a temp view (plus
  * the engine's custom functions) so users can drive the engine with plain
  * `spark.sql(...)` — the query surface is not Column-API-only.
  */
object GraftSession {

  /** Register all tables of `sfDir` as temp views named after the tables,
    * and the engine's SQL functions (cosine_similarity).
    *
    * Goes through the per-table loaders, NOT raw parquet reads: `events`
    * needs the TIMESTAMP(NANOS) handling in [[Tables.events]] — a raw load
    * would fail on a vanilla session (or silently expose `ts` as raw nanos
    * with the legacy flag set).
    */
  def open(spark: SparkSession, sfDir: String): SparkSession = {
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
      else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    spark
  }
}
