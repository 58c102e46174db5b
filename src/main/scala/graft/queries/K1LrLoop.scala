package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KMeans.sqlLit

/** k1: the FULL logistic-regression training loop (reference C4,
  * LogisticRegressionMaster/Worker) — 5 averaged-gradient steps over the
  * lineitem feature projection, declarative per-iteration aggregates with
  * the weight update in the driver.
  *
  * The oracle is the loop UNROLLED into chained CTEs: each iteration's
  * 1-row weights relation cross-joins into the next gradient aggregate
  * (the q9 pattern applied to gradient descent). Determinism contract:
  * per-iteration gradients round to 6 decimals and weights to 6 decimals on
  * BOTH sides, so summation-order noise cannot drift the trajectories.
  *
  * Per iteration this is one scan + one codegen'd aggregate returning 5
  * doubles to the driver — the whole training loop moves O(dims) data per
  * pass regardless of corpus size.
  */
object K1LrLoop extends GraftQuery {
  val name = "k1_lr_loop"
  val describe = "full LR training loop: 5 averaged-gradient steps, oracle = unrolled CTE chain"

  private val iterations = 5
  // lr = 1.0 keeps every weight update ON the 1e-6 rounding grid (w − g of
  // two 6-decimal values). A fractional lr like 0.5 would park updates
  // exactly on x.xxxxxx5 half-grid boundaries whenever the gradient's last
  // digit is odd — and which way such a boundary rounds then depends on
  // each engine's binary fuzz (observed: 2 of 25 weights flipping 1e-6).
  private val lr = 1.0
  private val w0 = Seq(0.0, 0.0, 0.0, 0.0, 0.0)
  private val dims = w0.length

  private def round6(x: Double): Double = graft.functions.Rounding.roundTo(x, 6)

  /** One averaged-gradient aggregate at fixed weights. */
  private def gradientStep(df: DataFrame, w: Seq[Double]): Array[Double] = {
    import LineitemFeatures._
    val err = sigmoidResidual(zExpr(w))
    val aggs = gradCols.zipWithIndex.map { case (f, j) =>
      round(sum(err * f) / count(lit(1)), 6).as(s"g$j")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    (0 until dims).map(row.getDouble).toArray
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    var w = w0
    for (_ <- 1 to graft.core.IterationBudget.effective(iterations)) {
      val g = gradientStep(li, w)
      w = w.zip(g).map { case (wi, gi) => round6(wi - lr * gi) }
    }
    import spark.implicits._
    Seq((w(0), w(1), w(2), w(3), w(4)))
      .toDF("w0", "w1", "w2", "w3", "w4")
  }

  val oracle = {
    import LineitemFeatures._
    val sb = new StringBuilder
    sb ++= s"WITH w0(${(0 until dims).map(i => s"w$i").mkString(", ")}) AS (VALUES (${w0.map(sqlLit).mkString(", ")}))"
    for (it <- 1 to iterations) {
      val err = sigmoidResidualSql(zSql((0 until dims).map(j => s"w.w$j")))
      val gCols = gradSql.zipWithIndex
        .map { case (f, j) => s"round(sum(($err) * $f) / count(*), 6) AS g$j" }
        .mkString(", ")
      sb ++= s",\ng$it AS (SELECT $gCols FROM lineitem CROSS JOIN w${it - 1} w)"
      val wCols = (0 until dims)
        .map(j => s"round(w.w$j - ${sqlLit(lr)} * g.g$j, 6) AS w$j").mkString(", ")
      sb ++= s",\nw$it AS (SELECT $wCols FROM w${it - 1} w CROSS JOIN g$it g)"
    }
    sb ++= s"\nSELECT ${(0 until dims).map(i => s"w$i").mkString(", ")} FROM w$iterations"
    Some(sb.toString)
  }
}
