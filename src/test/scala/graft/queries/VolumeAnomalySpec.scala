package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins for w11 beyond the DuckDB gate: the serial z replay, the exact
  * zero-sum theorem (per type, the z numerators n·x − S sum to EXACTLY 0 —
  * integers, no float tolerance), degenerate-history handling, and a
  * synthetic spike fixture where exactly the flood day flags.
  */
class VolumeAnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("w11 == serial replay; per-type z numerators sum to exactly 0 (sf0.001)") {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.events(spark, TestSpark.sf0001)
      .withColumn("day", (floor(unix_timestamp(col("ts")) / 86400L) * 86400L).cast("long"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byType = daily.groupBy(_._1)
    val want = byType.flatMap { case (t, rows) =>
      val n = rows.length.toLong
      val s = rows.map(_._3).sum
      val sq = rows.map(r => r._3 * r._3).sum
      val disc = n * sq - s * s
      rows.toSeq.map { case (_, day, x) =>
        val z = if (disc <= 0) 0L
          else math.round((n * x - s).toDouble / math.sqrt(disc.toDouble) * 1e6)
        (t, day) -> (x, n, z, math.abs(z) > 3000000L)
      }
    }.toMap
    val got = W11VolumeAnomaly.run(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == want, s"first diff: ${want.find(kv => got.get(kv._1) != Some(kv._2))}")
    // zero-sum theorem, exact integers
    byType.foreach { case (t, rows) =>
      val n = rows.length.toLong; val s = rows.map(_._3).sum
      assert(rows.map(r => n * r._3 - s).sum == 0L, s"type $t numerators don't cancel")
    }
  }

  test("a flood day flags; a constant history never does (synthetic)") {
    import spark.implicits._
    val daily = ((1 to 20).map(d => ("steady", d.toLong * 86400L, 10L)) ++    // constant -> disc 0
      ((1 to 19).map(d => ("spiky", d.toLong * 86400L, 10L)) :+ ("spiky", 20L * 86400L, 300L)))
      .toDF("event_type", "day", "cnt")
    val got = W11VolumeAnomaly.zScores(daily)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(4), r.getBoolean(5))).toMap
    (1 to 20).foreach { d =>
      assert(got(("steady", d.toLong * 86400L)) == ((0L, false)),
        "constant history produced a nonzero z")
    }
    val flagged = got.filter { case ((t, _), (_, a)) => t == "spiky" && a }
    assert(flagged.keySet == Set(("spiky", 20L * 86400L)),
      s"exactly the flood day must flag, got ${flagged.keySet}")
    assert(got(("spiky", 20L * 86400L))._1 > 4000000L, "flood z not extreme")
  }
}
