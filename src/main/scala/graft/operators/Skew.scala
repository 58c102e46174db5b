package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks (SURVEY §7 / build brief: "salting for
  * skew"). AQE's skew-join splitting handles most cases at runtime; these
  * are the explicit forms for when the skew is known and extreme (a handful
  * of hot keys holding a large fraction of all rows — the classic shape in
  * web/training corpora).
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 aggregates on (keys + salt) so a
    * hot key's rows spread over `salts` reducers; phase 2 merges the
    * partials per key. Correct for any algebraic aggregate expressed as
    * (partial, merge) — here sum/count (avg = sum/count at the end).
    *
    * The salt is derived from `spark_partition_id()` — rows of a hot key
    * land on many input partitions, and using the physical partition id
    * means zero extra hashing and no dependence on row content.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join for a skewed LEFT side against a small-ish RIGHT side:
    * left rows scatter across `salts` sub-keys; the right side is replicated
    * `salts`× (explode of a literal range). Equivalent to the plain join,
    * with the hot key's work spread over `salts` tasks.
    *
    * `joinType` supports the left-preserving forms too ("left"/"left_outer"):
    * every right key exists at every salt value, so a left row matches under
    * salting iff it matches in the plain join, and unmatched left rows
    * survive with NULL right columns exactly as unsalted.
    */
  def saltedJoin(
      skewedLeft: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    val l = skewedLeft.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted inner join on an ARBITRARY (pre-disambiguated: no shared column
    * names) condition — the form a composite-key or self-join-shaped skew
    * needs (d16's (table, bucket) candidate join, where one hot LSH bucket
    * makes a single join key quadratic). Left rows scatter by physical
    * partition id; the right side replicates `salts`×; each original row
    * pair matches at exactly ONE salt (the left row's), so the output is
    * row-identical to the unsalted join while the hot key's fan-out spreads
    * over `salts` tasks. The replication multiplies the right side's shuffle
    * volume `salts`× — worth it exactly when one key dominates.
    */
  def saltedJoinOn(
      skewedLeft: DataFrame,
      right: DataFrame,
      condition: Column,
      salts: Int): DataFrame = {
    val l = skewedLeft.withColumn("__salt_l", pmod(spark_partition_id(), lit(salts)))
    val r = right.withColumn("__salt_r", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, condition && col("__salt_l") === col("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
