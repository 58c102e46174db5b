package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression for [[graft.operators.TextOps.gramHashes]]:
  * the 62-bit k-token rolling window hash over a token-hash array, computed
  * with the TRUE rolling update the TextOps scaladoc already names as the
  * O(tokens) form — h′ = ((h − t_out·A^{k−1})·A + t_in) mod P — instead of
  * re-folding a k-element slice twice per window (O(tokens·k) work and one
  * slice allocation per window in the combinator form).
  *
  * Value contract (bit-identical to the combinator form, GramHashSpec):
  * window at position i (1-based) hashes tokens i..i+k−1 as
  * foldA·(P+1) + foldB, where fold_M = left fold ((acc·M + t) mod P) seeded
  * 0 and P = 2^31−1. The rolling update computes the same residue: both are
  * the window's polynomial Σ t_j·M^(k−1−j) mod P. All intermediates stay
  * below 2^63 (acc, t < 2^31; t·A^{k−1} mod P re-reduced before the
  * subtract; (acc−x+P)·A < 2^52), so no overflow wrap can diverge from the
  * reference arithmetic.
  *
  * Null/short-input semantics (matches the `when(size(a) >= k, …)
  * .otherwise(array())` + flatten shape exactly): fewer than k tokens — or a
  * null input array — yields an EMPTY array, never null. Nulls inside the
  * array are not supported (token hashes are non-null by construction).
  */
case class GramHash(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  require(k >= 2, s"gram_hash requires k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hash"
  // Null input maps to an empty array (see scaladoc) — never null out.
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) GramHash.empty
    else GramHash.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val cls = "org.apache.spark.sql.graft.GramHash"
    val ad = "org.apache.spark.sql.catalyst.util.ArrayData"
    ev.copy(
      code = code"""
        |${c.code}
        |$ad ${ev.value} = ${c.isNull}
        |  ? $cls.empty()
        |  : $cls.compute(${c.value}, $k);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHash {
  /** Mersenne prime 2^31−1 and the two fold multipliers — MUST match
    * TextOps (TokenPrime / GramA / GramB); GramHashSpec pins the values.
    */
  final val P: Long = 2147483647L
  final val A: Long = 1000003L
  final val B: Long = 1000033L

  private val emptyArr: ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
  def empty(): ArrayData = emptyArr

  private def powMod(m: Long, e: Int): Long = {
    var r = 1L
    var i = 0
    while (i < e) { r = (r * m) % P; i += 1 }
    r
  }

  def compute(ht: ArrayData, k: Int): ArrayData = {
    val n = ht.numElements()
    if (n < k) return emptyArr
    val m = n - k + 1
    val out = new Array[Long](m)
    val pwA = powMod(A, k - 1)
    val pwB = powMod(B, k - 1)
    // Every loaded token is reduced mod P up front (round 16, ADVICE r15):
    // the rolling subtract computes (tOut · A^{k−1}) and a raw token ≥ 2^32
    // would overflow Long there, silently diverging from the composed fold
    // (which tolerates any ~60-bit token by congruence — its intermediates
    // stay < 2^63). Reducing first is congruence-neutral ((acc·A + t) ≡
    // (acc·A + t mod P) mod P), so bit-equality with the witness form now
    // holds for the full non-negative domain, not just the documented
    // < 2^31 pre-reduced inputs (GramHashSpec pins a ≥ 2^32 fixture).
    // Fold the first window once, then roll.
    var hA = 0L
    var hB = 0L
    var j = 0
    while (j < k) {
      val t = ht.getLong(j) % P
      hA = (hA * A + t) % P
      hB = (hB * B + t) % P
      j += 1
    }
    out(0) = hA * (P + 1) + hB
    var i = 1
    while (i < m) {
      val tOut = ht.getLong(i - 1) % P
      val tIn = ht.getLong(i + k - 1) % P
      var sA = hA - (tOut * pwA) % P
      if (sA < 0) sA += P
      hA = (sA * A + tIn) % P
      var sB = hB - (tOut * pwB) % P
      if (sB < 0) sB += P
      hB = (sB * B + tIn) % P
      out(i) = hA * (P + 1) + hB
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def gramHashCol(ht: Column, k: Int): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      GramHash(org.apache.spark.sql.classic.ExpressionUtils.expression(ht), k))
}
