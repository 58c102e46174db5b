package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double-array columns with
  * whole-stage-codegen support — the fused sibling of [[CosineSimilarity]]
  * for raw projections (sign-LSH bucket bits, linear scoring).
  *
  * Why it exists: an unrolled per-component `dotConst` against a 64-dim
  * constant vector is ~128 Catalyst nodes; 12 of those in one projection
  * (3 LSH tables × 4 planes) is ~1,500 nodes, and whole-stage codegen spends
  * multiple SECONDS in janino on trees that size (the measured wide-tree
  * pitfall from round 1). This expression is one tight loop; the constant
  * side arrives as an ordinary array literal.
  *
  * Determinism contract with the DuckDB oracle: accumulates left-to-right in
  * index order from a 0.0 accumulator — identical IEEE result to the
  * unrolled left-associated SQL chain (0 + x = x exactly), so `dot >= 0`
  * bucket bits match the oracle's unrolled form bit-for-bit.
  *
  * Mismatched lengths throw (same policy as [[CosineSimilarity]]).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"dot_product: array lengths differ (${x.numElements()} vs ${y.numElements()})")
    var dot = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product: array lengths differ (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  final val FunctionName = "dot_product"

  /** The one arity-checked builder BOTH registration routes use (imperative
    * [[register]] and graft.GraftExtensions' injectFunction), so they cannot
    * drift.
    */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$FunctionName requires exactly 2 arguments, got ${exprs.length}")
    DotProduct(exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point; requires [[register]] on the active session. */
  def dotProduct(a: Column, b: Column): Column =
    call_function(FunctionName, a, b)

  /** Registration-free Column entry point (the Md5Hash60.hash60Col /
    * GramHash.gramHashCol route): builds the expression directly, so query
    * code can use the fused dot without a register() preamble on the
    * session — v3/v4's centroid scoring runs from any entry point.
    */
  def dotProductCol(a: Column, b: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      DotProduct(
        org.apache.spark.sql.classic.ExpressionUtils.expression(a),
        org.apache.spark.sql.classic.ExpressionUtils.expression(b)))
}
