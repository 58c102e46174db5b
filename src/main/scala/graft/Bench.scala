package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Per-round benchmark harness: times every registered query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line (driver contract).
  *
  * Measurement notes:
  *   - results are materialized through the `noop` sink, which executes the
  *     full plan; `.count()` would let Catalyst prune the measured work away
  *     entirely (a projection benchmarked by count() computes nothing);
  *   - one untimed warmup query first so session/JIT/codegen warmup isn't
  *     attributed to whichever query runs first;
  *   - shuffle partitions = cpu count (local mode; the 200 default just
  *     fragments tiny partitions).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS); fixed at session build so read
      // behavior never depends on query execution order (see Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Unit = {
      Registry.byName(name).run(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      // Drop any intermediates a query persisted: keeps measurements
      // order-independent (no query benefits from a predecessor's cache)
      // and prevents cache creep across the 39-query run.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    // Warmup (untimed): touches the scan + codegen paths.
    try exec("q1_agg") catch { case _: Throwable => () }

    val results = Registry.all.map { q =>
      val t0 = System.nanoTime()
      try exec(q.name)
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
