package graft.functions

/** Driver-side decimal rounding used wherever iterative queries carry
  * rounded state (k-means centers, LR weights): HALF_UP on the exact binary
  * expansion — the behavior DuckDB's round() exhibits for these magnitudes,
  * kept in ONE place so every loop rounds identically.
  */
object Rounding {
  def roundTo(x: Double, decimals: Int): Double =
    BigDecimal(x).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble
}
