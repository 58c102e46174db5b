package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (each left row matched to the most recent right row at or
  * before its event time, per key) composed from built-ins — preference
  * order (a) from the build brief: no custom operator needed because the
  * union-and-carry-forward formulation expresses it exactly:
  *
  *   union both sides tagged → one window per key ordered by (time, side) →
  *   `last(right columns, ignoreNulls)` over an unbounded-preceding frame
  *   carries the latest right values forward → keep left rows.
  *
  * Cost: ONE shuffle on the key + a per-partition sort — same as any
  * windowed computation, and strictly better than the naive
  * join-filter-aggregate (which explodes to |L|×|R| per key before
  * collapsing). Right rows sort before left rows at equal timestamps, so
  * "at or before" includes ties (DuckDB ASOF `>=` semantics).
  *
  * At 100 TB this scales like sessionization: partition by key, sort within
  * partition; skewed keys salt the same way.
  */
object AsOfJoin {

  /** @param left       left rows (must contain `key` and `time`)
    * @param right      right rows (must contain `key` and `time`)
    * @param key        equi-join key column name
    * @param time       event-time column name (same name both sides)
    * @param rightCols  right columns to carry (become `asof_<name>`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Right columns travel as ONE struct so the carry-forward is atomic per
    // matched row: carrying each column with its own last(ignoreNulls) would
    // stitch values from DIFFERENT right rows whenever a carried column
    // holds a null (the struct itself is non-null for every right row, even
    // when its fields are null — true as-of semantics).
    val rStruct = struct(rightCols.map(col): _*)
    val rType = {
      import org.apache.spark.sql.types.{StructField, StructType}
      StructType(rightCols.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    }
    val l = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filter(c => c != key && c != time).map(col) :+
        lit(null).cast(rType).as("__r"): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filter(c => c != key && c != time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((Seq(col(key), col(time)) ++
        leftCols.filter(c => c != key && c != time).map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c"))): _*)
  }
}
