package graft

import org.apache.spark.sql.SparkSession

/** SQL entry point: registers every test-data table as a temp view (plus
  * the engine's custom functions) so users can drive the engine with plain
  * `spark.sql(...)` — the query surface is not Column-API-only.
  */
object GraftSession {

  /** Register all tables of `sfDir` as temp views named after the tables,
    * and the engine's SQL functions (cosine_similarity, dot_product).
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
    registerFunctions(spark)
    spark
  }

  /** Register the engine's custom expressions on a session. */
  def registerFunctions(spark: SparkSession): Unit = {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    org.apache.spark.sql.graft.DotProduct.register(spark)
    org.apache.spark.sql.graft.SortedContains.register(spark)
  }
}

/** `SparkSessionExtensions` injection point — lets a cluster opt into the
  * engine's custom expressions at session-build time, with no code call:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * The injected builders are the same ones [[GraftSession.registerFunctions]]
  * registers imperatively; both routes resolve to identical expressions, so
  * plans and results don't depend on how the function arrived.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")
    // Same builder objects the imperative register() path uses — one
    // definition per function, no route drift possible.
    ext.injectFunction((
      FunctionIdentifier(org.apache.spark.sql.graft.CosineSimilarity.FunctionName),
      info(org.apache.spark.sql.graft.CosineSimilarity.FunctionName,
        "cosine_similarity(a, b) - cosine of two double arrays (NULL on zero norm)"),
      org.apache.spark.sql.graft.CosineSimilarity.builder))
    ext.injectFunction((
      FunctionIdentifier(org.apache.spark.sql.graft.DotProduct.FunctionName),
      info(org.apache.spark.sql.graft.DotProduct.FunctionName,
        "dot_product(a, b) - dot product of two double arrays"),
      org.apache.spark.sql.graft.DotProduct.builder))
    ext.injectFunction((
      FunctionIdentifier(org.apache.spark.sql.graft.SortedContains.FunctionName),
      info(org.apache.spark.sql.graft.SortedContains.FunctionName,
        "sorted_contains(arr, v) - binary-search membership in a sorted long array"),
      org.apache.spark.sql.graft.SortedContains.builder))
  }
}
