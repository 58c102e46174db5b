package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's portable 60-bit hash:
  * bit-identical to `conv(substring(md5(cast(x as binary)), 1, 15), 16, 10)
  * cast to long` — the first 15 hex chars of the md5 digest are exactly the
  * top 60 bits of its first 8 bytes — but computed straight from the digest
  * bytes.
  *
  * Why it exists (optimization round 15, guide §1.2 step 2 "per-task
  * work"): [[graft.functions.Portable.hash60]] runs ONCE PER TOKEN across
  * the entire text family (tokenHashes feeds every shingle/gram/winnow
  * chain), and the composed built-in form allocates a 32-char hex string
  * (commons-codec Hex), a substring copy, and a string→long radix parse
  * (NumberConverter) per call — three allocations and two parses to reach a
  * number the digest already contains. This expression takes the UTF-8
  * bytes, digests them into a thread-local MD5 (commons-codec also
  * constructs a fresh MessageDigest per md5() call), and assembles the long
  * with shifts. Values are IDENTICAL (Md5Hash60Spec pins equality against
  * the composed form on ASCII/unicode/empty/long inputs and the whole
  * corpus; every oracle hash gate re-proves it end to end), so no declared
  * query's output changes — only its plan does.
  *
  * Null propagation: null input → null (UnaryExpression nullSafeEval), same
  * as the md5 chain. Codegen stays inside whole-stage codegen via a static
  * helper call, the [[SortedContains]] discipline.
  */
// ExpectsInputTypes, NOT ImplicitCastInputTypes (round 16, ADVICE r15): the
// composed chain this replaces digested cast(x AS BINARY), so a non-string
// input implicitly cast to its DECIMAL STRING here would silently hash
// different bytes than the witness form. All callers pass strings; a
// non-string input now fails analysis instead of diverging latently
// (Md5Hash60Spec pins the rejection).
case class Md5Hash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"
  // The composed md5/conv chain it replaces constant-folds over literal
  // input; keep that property so seeded-literal hashes fold at plan time.
  override def foldable: Boolean = child.foldable

  override def nullSafeEval(input: Any): Any =
    Md5Hash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Md5Hash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Hash60 {
  final val FunctionName = "md5_hash60"

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes) as a non-negative long — the value of the
    * first 15 hex chars of the digest read base-16.
    */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // First 8 digest bytes as a big-endian unsigned long, dropped to 60
    // bits: hex chars 1..15 are bits 127..68 of the digest == bits 63..4 of
    // this word.
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  /** The one arity-checked builder both registration routes use. */
  def builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"$FunctionName requires exactly 1 argument, got ${exprs.length}")
    Md5Hash60(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FunctionName, builder, "built-in")

  /** Column-API entry point — builds the expression directly (no session
    * registration needed, unlike call_function), so
    * [[graft.functions.Portable.hash60]] can route through it
    * unconditionally from any query without a register() preamble.
    */
  def hash60Col(c: Column): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      Md5Hash60(org.apache.spark.sql.classic.ExpressionUtils.expression(c)))
}
