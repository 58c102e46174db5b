package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for the winnowing window-minimum: for a gram
  * hash array `a` and window width `w`, the minimum of each w-wide window —
  * out(i) = min(a(i..i+w−1)) for i = 0..n−w — computed with the monotonic
  * deque in O(n) total, replacing the combinator form
  * `transform(sequence(w, size(a)), p -> array_min(slice(a, p-(w-1), w)))`
  * whose per-window slice+min is O(n·w) work plus one array allocation per
  * window, evaluated through interpreted higher-order functions.
  *
  * Value contract (bit-identical to the combinator form, WindowMinSpec):
  * plain integer minima, so there is no arithmetic to diverge — the only
  * contracts are WHICH windows exist (exactly the full windows, one per
  * position w..n 1-based) and the empty-for-short/null-input shape.
  *
  * Null/short-input semantics (matches `when(size(a) >= w, …)
  * .otherwise(array())`): fewer than w elements — or a null input array —
  * yields an EMPTY array, never null. Nulls inside the array are not
  * supported (gram hashes are non-null by construction).
  */
case class WindowMin(child: Expression, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  require(w >= 1, s"window_min requires w >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_min"
  // Null input maps to an empty array (see scaladoc) — never null out.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WindowMin.empty
    else WindowMin.compute(v.asInstanceOf[ArrayData], w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = "org.apache.spark.sql.graft.WindowMin"
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        |${c.code}
        |$ad ${ev.value} = ${c.isNull}
        |  ? $cls.empty()
        |  : $cls.compute(${c.value}, $w);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowMin {
  private val emptyArr: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
  def empty(): ArrayData = emptyArr

  /** Sliding-window minimum by monotonic deque: the deque holds indices of
    * a non-decreasing run of values; the head is always the current
    * window's minimum. Each index enters and leaves the deque at most once
    * — O(n) total regardless of w.
    */
  def compute(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n < w) return emptyArr
    val out = new Array[Long](n - w + 1)
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // deque is dq[head, tail)
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def windowMinCol(a: Column, w: Int): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      WindowMin(org.apache.spark.sql.classic.ExpressionUtils.expression(a), w))
}
