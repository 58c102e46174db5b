package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double-array columns
  * with full whole-stage-codegen support (preference order (b) from the
  * build brief — a custom `Expression` where composing built-ins is
  * possible but pathological).
  *
  * Why not built-ins: the compositional form is either 3×d `element_at`
  * nodes unrolled per pair (huge expression trees — slow to codegen-compile
  * and to evaluate) or higher-order `aggregate`/`zip_with` folds
  * (interpreted per element, and their lambdas must not capture outer
  * expressions — see TextOps.shingles). This expression is one tight fused
  * loop in both interpreted and generated form.
  *
  * Determinism contract with the DuckDB oracle: accumulates dot and the two
  * squared norms left-to-right in index order and returns
  * dot / (sqrt(nx) · sqrt(ny)) — exactly the unrolled SQL's arithmetic
  * (+, *, /, sqrt are IEEE exactly-rounded), so results are bit-identical
  * to the generated per-dimension SQL.
  *
  * Null array elements are not supported (undefined per ArrayData.getDouble)
  * — callers guarantee dense embeddings. float arrays arrive via the
  * implicit array<float> → array<double> widening cast, which is exact.
  *
  * Edge semantics (explicit, not emergent): mismatched array lengths throw
  * (a silent min-length prefix would hide corrupt embeddings), and a
  * zero-norm input yields SQL NULL — the engines disagree on double 0/0
  * (IEEE NaN vs NULL), so NULL is the one portable answer and composes with
  * filters/ranking the way missing data should.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  // Zero-norm inputs produce NULL even when both arrays are non-null.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"cosine_similarity: array lengths differ (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "cosine_similarity: array lengths differ (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $dot = 0.0;
         |double $nx = 0.0;
         |double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi;
         |  $nx += $xi * $xi;
         |  $ny += $yi * $yi;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  final val FunctionName = "cosine_similarity"

  /** The one arity-checked builder BOTH registration routes use (imperative
    * [[register]] and graft.GraftExtensions' injectFunction), so they cannot
    * drift.
    */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"$FunctionName requires exactly 2 arguments, got ${exprs.length}")
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Idempotently register on a session; afterwards usable from Column code
    * (via [[cosineSimilarity]]) AND plain SQL.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point; requires [[register]] on the active session. */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function(FunctionName, a, b)
}
