package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The exact-average contract (VERDICT r6 items 1/6): for grid-valued
  * columns, `Rounding.exactAvg` must be a pure function of the value
  * MULTISET — independent of row order and partitioning — because its
  * result feeds hashes (t17) and argmaxes (v4) that a last-ulp summation
  * flip would silently change.
  */
object ExactAvgProperties extends Properties("exactAvg") {

  // Grid values in [-2, 2] as micro-units (the 1e-6 grid t17/v4 use).
  private val genMicros = Gen.nonEmptyListOf(Gen.chooseNum(-2000000L, 2000000L))

  /** Driver-side model of exactAvg's op sequence: per-row scaled round to
    * long (exact for grid inputs), exact long sum, then the two double
    * divisions and the final round — all correctly-rounded IEEE ops on
    * integers, hence order-free.
    */
  private def model(micros: Seq[Long]): Double = {
    val sum = micros.map { m =>
      val v = m.toDouble / 1e6 // the double the column actually holds
      BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    Rounding.roundTo(sum.toDouble / micros.size / 1e6, 6)
  }

  property("permutation invariant (bit-exact)") =
    forAll(genMicros, Gen.long) { (micros, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(micros)
      java.lang.Double.doubleToLongBits(model(micros)) ==
        java.lang.Double.doubleToLongBits(model(shuffled))
    }

  property("per-row scaled round recovers the exact micro integer") =
    forAll(genMicros) { micros =>
      micros.forall { m =>
        val v = m.toDouble / 1e6
        BigDecimal(v * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong == m
      }
    }

  property("within half a grid step of the true mean") =
    forAll(genMicros) { micros =>
      val exact = BigDecimal(micros.sum) / BigDecimal(micros.size) / BigDecimal(1000000)
      (BigDecimal(model(micros)) - exact).abs <= BigDecimal("0.0000005000001")
    }
}

/** Spark-side pin: the Column implementation is partition-order free even on
  * adversarial midpoint data, and matches the driver-side model bit-for-bit.
  */
class RoundingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sparkExactAvg(micros: Seq[Long], partitions: Int, reverse: Boolean): Double = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val vals = (if (reverse) micros.reverse else micros).map(_.toDouble / 1e6)
    vals.toDF("q").repartition(partitions)
      .agg(Rounding.exactAvg(col("q"), 6).as("a"))
      .head().getDouble(0)
  }

  test("exactAvg is bit-identical across partitionings and row orders (midpoint-heavy data)") {
    // Mean = (1+2)/2 = 1.5 micro — an exact grid midpoint, the case where
    // round(avg(double)) flips on summation order (t17's round-6 failure).
    val midpoint = Seq(1L, 2L)
    // A larger set whose mean is micro-midpoint by construction: n=4 values
    // summing to 4k+2 micros.
    val crafted = Seq(999999L, 1000001L, 500000L, -499998L) // sum = 2000002
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(257)(rnd.between(-2000000L, 2000000L))
    for (micros <- Seq(midpoint, crafted, random)) {
      val runs = for {
        p <- Seq(1, 3, 7)
        r <- Seq(false, true)
      } yield java.lang.Double.doubleToLongBits(sparkExactAvg(micros, p, r))
      assert(runs.distinct.size == 1,
        s"exactAvg varied across partitionings/orders on $micros: $runs")
      val expected = {
        val sum = micros.sum
        Rounding.roundTo(sum.toDouble / micros.size / 1e6, 6)
      }
      assert(java.lang.Double.longBitsToDouble(runs.head) == expected)
    }
  }
}
