package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BooleanType, DataType, LongType}

/** Native Catalyst expression: membership test against a SORTED long-array
  * column by binary search — O(log n) per probe where `array_contains` is
  * O(n). The expression p7's span strip needs: its per-token filter probes
  * the document's covered-position list once per token, so a fully-
  * duplicated L-token document costs O(L·L) with `array_contains` but
  * O(L log L) here — the difference between a pathological long document
  * stalling an executor and not (the array is doc-bounded, so this is a
  * per-row constant at corpus scale either way; the log form removes the
  * long-document tail).
  *
  * CONTRACT: the array must be sorted ascending (callers build it with
  * `sort_array`/`collect_list` or DuckDB `list_sort`). On an unsorted array
  * the result is unspecified — exactly the contract of every binary search.
  * Null array or null probe → NULL (standard null propagation via
  * BinaryExpression's nullSafeEval); null ELEMENTS are not supported
  * (callers build the array from non-null positions).
  *
  * Codegen: one tight branch-free-ish loop, same discipline as
  * [[CosineSimilarity]] — stays inside whole-stage codegen, no boxing.
  */
case class SortedContains(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_contains"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val v = b.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val m = arr.getLong(mid)
      if (m == v) return true
      else if (m < v) lo = mid + 1
      else hi = mid - 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val m = ctx.freshName("m")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements() - 1;
         |${ev.value} = false;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  long $m = $a.getLong($mid);
         |  if ($m == $b) { ${ev.value} = true; break; }
         |  else if ($m < $b) { $lo = $mid + 1; }
         |  else { $hi = $mid - 1; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedContains {
  final val FunctionName = "sorted_contains"

  /** The one arity-checked builder both registration routes use. */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$FunctionName requires exactly 2 arguments, got ${exprs.length}")
    SortedContains(exprs(0), exprs(1))
  }

  /** Idempotently register on a session; afterwards usable from Column code
    * (via [[sortedContains]]) AND plain SQL.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point; requires [[register]] on the active session. */
  def sortedContains(arr: Column, value: Column): Column =
    call_function(FunctionName, arr, value)
}
