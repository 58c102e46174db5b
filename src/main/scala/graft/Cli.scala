package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Command-line client — the engine's analogue of the reference's client
  * surface (guagua-mapreduce/.../GuaguaMapReduceClient.java:425-487,
  * GuaguaOptionsParser.java:378-398). The reference CLI assembles a job
  * from an input path, reflected computable classes and a pluggable
  * `-inputformat`; here the unit of work is a registered declared query and
  * the pluggable piece is the [[graft.sources.SourceFormat]] decoding the
  * input directory:
  *
  *   -i <dir>           input data directory (reference `-i`)
  *   -o <dir>           output directory; the result lands at
  *                      `<dir>/<query>.parquet`
  *   -q <name>          declared query to run (reference `-w`/`-m` name the
  *                      computable classes; our computables are registered
  *                      under stable names — see `-list`)
  *   -inputformat <cls> fully-qualified [[graft.sources.SourceFormat]]
  *                      class name, loaded by reflection with the
  *                      reference's error contract (unknown class and
  *                      wrong supertype each fail loudly, before any Spark
  *                      job starts — GuaguaMapReduceClient.java:471-487)
  *   -n <job name>      Spark job description (reference `-n`)
  *   -list              print every registered query name and exit
  *
  * `main` owns a session; [[runWith]] is the same logic over a caller's
  * session (the testable core, and the embedding API a driver program
  * would call).
  */
object Cli {

  def usage: String =
    """usage: graft.Cli [options]
      |  -i <input dir>        specify input data directory.
      |  -o <output dir>       specify output directory (result written as <query>.parquet).
      |  -q <query name>       specify declared query name (see -list).
      |  -inputformat <class>  specify SourceFormat class name for the input directory.
      |  -n <job name>         specify job name.
      |  -list                 list registered query names.""".stripMargin

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try runWith(spark, args)
    finally spark.stop()
  }

  /** Parse and execute. Returns the result frame when a query ran (None for
    * `-list`). Throws IllegalArgumentException with a printed usage on any
    * malformed invocation — the reference's parser prints help and the
    * client refuses the job (GuaguaOptionsParser.java:356-370).
    */
  def runWith(spark: SparkSession, args: Array[String]): Option[DataFrame] = {
    val opts = parse(args)
    if (opts.contains("list")) {
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      return None
    }
    val input = required(opts, "i", "input directory")
    val query = required(opts, "q", "query name")
    opts.get("inputformat").foreach { cls =>
      Tables.registerFormat(input, resolveFormat(cls))
    }
    opts.get("n").foreach(spark.sparkContext.setJobDescription)
    val fn = SparkEntry.queries.getOrElse(query,
      throw new IllegalArgumentException(
        s"Unknown query '$query' — run with -list for registered names."))
    val df = fn(spark, input)
    opts.get("o").foreach { out =>
      df.write.mode("overwrite").parquet(s"$out/$query.parquet")
    }
    Some(df)
  }

  /** Reflect a [[graft.sources.SourceFormat]] by name, mirroring the
    * reference's two-stage check (class resolvable, then assignable) and
    * its error messages (GuaguaMapReduceClient.java:471-487).
    */
  private[graft] def resolveFormat(className: String): graft.sources.SourceFormat = {
    val cls =
      try Class.forName(className.trim)
      catch {
        case e: ClassNotFoundException =>
          throw new IllegalArgumentException(
            s"The inputformat class ${className.trim} set by '-inputformat' " +
            "can not be found in class path.", e)
      }
    if (!classOf[graft.sources.SourceFormat].isAssignableFrom(cls))
      throw new IllegalArgumentException(
        "Input format class set by '-inputformat' should extend " +
        "graft.sources.SourceFormat")
    cls.getDeclaredConstructor().newInstance()
      .asInstanceOf[graft.sources.SourceFormat]
  }

  private def required(opts: Map[String, String], key: String, what: String): String =
    opts.getOrElse(key, {
      System.err.println(usage)
      throw new IllegalArgumentException(s"Missing -$key <$what>.")
    })

  private def parse(args: Array[String]): Map[String, String] = {
    val valued = Set("i", "o", "q", "inputformat", "n")
    val flags = Set("list")
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case opt :: tail if opt.startsWith("-") =>
          val name = opt.dropWhile(_ == '-')
          if (flags(name)) loop(tail, acc + (name -> "true"))
          else if (valued(name)) tail match {
            case v :: more => loop(more, acc + (name -> v))
            case Nil =>
              System.err.println(usage)
              throw new IllegalArgumentException(s"Option $opt requires a value.")
          }
          else {
            System.err.println(usage)
            throw new IllegalArgumentException(s"Unknown option $opt.")
          }
        case stray :: _ =>
          System.err.println(usage)
          throw new IllegalArgumentException(s"Stray argument '$stray'.")
      }
    loop(args.toList, Map.empty)
  }
}
