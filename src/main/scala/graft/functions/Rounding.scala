package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Decimal-grid rounding discipline, kept in ONE place so every query that
  * carries rounded state rounds identically on both engines.
  *
  * [[roundTo]] is the driver-side HALF_UP used by the iterative loops
  * (k-means centers, LR weights). [[exactAvg]]/[[exactAvgSql]] are the
  * ORDER-INDEPENDENT mean for values already sitting on a 10^-scale decimal
  * grid: `round(avg(x), s)` sums doubles in partition order on Spark but
  * sequential order in a single-node oracle, and when the true mean lands on
  * a grid MIDPOINT (likely precisely when the inputs are grid values — a
  * mean of 1e-6-grid values over n rows is an exact multiple of 1e-6/n) the
  * last-ulp summation difference flips the rounded digit (t17's round-6
  * hash failure). Summing the grid values as scaled LONGS is exact in any
  * order; the final divisions and round run on identical (sum, count)
  * integers in both engines, so every op is a correctly-rounded IEEE double
  * op on identical inputs — bit-equal by construction.
  */
object Rounding {
  def roundTo(x: Double, decimals: Int): Double =
    BigDecimal(x).setScale(decimals, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Order-independent `round(avg(c), outScale)` for a column whose values
    * lie on the 10^-gridScale grid (already passed through
    * `round(_, gridScale)`, or integers / fixed-decimal business values like
    * lineitem's 2-decimal prices). The scaled values are within ~1 ulp of
    * integers, so `round(c * f)` is the exact integer on both engines; the
    * long sum is exact; the divisions and final round are correctly-rounded
    * ops on identical (sum, count) inputs.
    *
    * ALSO valid for ARBITRARY doubles with a gridScale well below the
    * output scale (e.g. gridScale 12, outScale 6): per-row ops on identical
    * IEEE inputs are bit-equal across engines — `c * f` is the same double
    * product and `round` of the same double is the same long on both sides,
    * even at a midpoint — so the only cross-engine hazard in `round(avg)`
    * is SUMMATION ORDER, which the exact long sum removes. The result is
    * the exact mean of the 10^-gridScale-quantized values (each input
    * perturbed ≤ 5·10^-(gridScale+1), identically on both engines), i.e.
    * `round(avg, outScale)` up to a deterministic sub-grid quantization —
    * the v1/v3/v4 centroid discipline. Overflow bound as in [[exactSum]]:
    * per-GROUP Σ|c|·10^gridScale must stay under Long.Max (~9.2e18); a
    * group whose scaled mass exceeds that swaps the long for a
    * `decimal(38, gridScale)` accumulator, same order-independence.
    */
  def exactAvg(c: Column, gridScale: Int, outScale: Int): Column = {
    val f = math.pow(10, gridScale)
    round(sum(round(c * f).cast("long")).cast("double") / count(c) / f, outScale)
  }

  def exactAvg(c: Column, scale: Int): Column = exactAvg(c, scale, scale)

  /** The DuckDB mirror of [[exactAvg]] — same op sequence, same literals. */
  def exactAvgSql(expr: String, gridScale: Int, outScale: Int): String = {
    val f = math.pow(10, gridScale)
    s"round(CAST(sum(CAST(round(($expr) * $f) AS BIGINT)) AS DOUBLE) / count($expr) / $f, $outScale)"
  }

  def exactAvgSql(expr: String, scale: Int): String = exactAvgSql(expr, scale, scale)

  /** Order-independent `round(sum(c), outScale)` for a 10^-gridScale-grid
    * column. A double sum of grid values carries O(√n·ε·Σ|x|) accumulated
    * error — ~1e-3 on 600k 4-digit prices, within the 5e-3 rounding margin
    * at test scale but NOT at 100× the rows — while the scaled-long sum is
    * exact at any n with Σ|scaled| below Long.Max (~9.2e18; a corpus whose
    * scaled total exceeds that swaps the long for a `decimal(38, gridScale)`
    * sum — same order-independence argument, wider accumulator).
    */
  def exactSum(c: Column, gridScale: Int, outScale: Int): Column = {
    val f = math.pow(10, gridScale)
    round(sum(round(c * f).cast("long")).cast("double") / f, outScale)
  }

  /** The DuckDB mirror of [[exactSum]]. */
  def exactSumSql(expr: String, gridScale: Int, outScale: Int): String = {
    val f = math.pow(10, gridScale)
    s"round(CAST(sum(CAST(round(($expr) * $f) AS BIGINT)) AS DOUBLE) / $f, $outScale)"
  }
}
