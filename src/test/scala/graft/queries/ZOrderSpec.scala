package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the layout property q24 exists for — the thing the oracle's hash
  * can't express: Morton-curve storage units are ALIGNED 16×16 grid tiles,
  * so per-unit min/max stats prune multi-dimensionally.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every z-order unit is contained in one aligned 16x16 tile") {
    val units = Q24ZOrder.run(spark, TestSpark.sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(units.nonEmpty)
    for ((unit, n, minX, maxX, minY, maxY) <- units) {
      assert(n > 0)
      // 256 consecutive Morton cells fix the top 4 bits of both dims: the
      // unit's extent must sit inside ONE 16-aligned 16x16 tile.
      assert(minX / 16 == maxX / 16, s"unit $unit spans x tiles [$minX, $maxX]")
      assert(minY / 16 == maxY / 16, s"unit $unit spans y tiles [$minY, $maxY]")
    }
  }

  /** The physical write path the operator exists for, materialized ONCE for
    * the layout + pruned-read tests: cluster storage by curve position
    * (repartitionByRange on z), write parquet, then build the per-FILE
    * min/max stats index a table format (Delta/Iceberg) keeps in metadata.
    */
  private lazy val layout: (String, Array[(String, Int, Int, Int, Int)]) = {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val li = graft.Tables.lineitem(spark, TestSpark.sf001)
      .select(col("l_partkey").as("x"), col("l_suppkey").as("y"))
    val ext = li.agg(min($"x").as("minx"), max($"x").as("maxx"),
      min($"y").as("miny"), max($"y").as("maxy"))
    val grid = li.crossJoin(broadcast(ext)).select(
      expr("CAST((x - minx) * 256 div (maxx - minx + 1) AS INT)").as("xb"),
      expr("CAST((y - miny) * 256 div (maxy - miny + 1) AS INT)").as("yb"))
    val z = grid.withColumn("z",
      (0 until 8).map { i =>
        shiftleft(shiftright($"xb", i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright($"yb", i).bitwiseAND(1), 2 * i + 1)
      }.reduce(_ + _))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    z.repartitionByRange(16, $"z").write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val stats = files.map { f =>
      val s = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"xb"), max($"xb"), min($"yb"), max($"yb")).collect()(0)
      (f.getAbsolutePath, s.getInt(0), s.getInt(1), s.getInt(2), s.getInt(3))
    }
    (dir, stats)
  }

  test("physical layout: z-range-partitioned parquet files have bounded 2-D extents") {
    // Every file's 2-D extent area must be far below the full grid — the
    // pruning a single-column sort cannot give both dimensions.
    // (RangePartitioner boundaries come from sampling, so the per-file
    // split points vary run to run; the BOUND asserted here holds for any
    // contiguous z-range, which is the property being bought.)
    val (_, stats) = layout
    assert(stats.length >= 8, s"expected >=8 part files, got ${stats.length}")
    val fullArea = 256.0 * 256.0
    val areas = stats.map { case (_, minX, maxX, minY, maxY) =>
      (maxX - minX + 1).toDouble * (maxY - minY + 1)
    }
    val worst = areas.max / fullArea
    val files = stats
    info(f"worst per-file extent area: ${worst * 100}%.1f%% of the grid (${files.length} files)")
    // A contiguous 1/16th of the z-curve spans at most a quarter of the
    // grid's area in stats-extent terms (two adjacent aligned quadrants +
    // spill); a y-sorted layout would put ~100%-width x-extents in EVERY
    // file. The bound is deliberately loose — it must hold for any sampled
    // range boundaries — but still excludes the no-locality layout.
    assert(worst <= 0.5, f"a z-range file covered ${worst * 100}%.0f%% of the grid")
    assert(areas.count(_ / fullArea <= 0.26) >= files.length / 2,
      "fewer than half the files are quadrant-bounded — z-locality broken")
  }

  test("pruning arithmetic: an x-slab touches a bounded fraction of units") {
    val units = Q24ZOrder.run(spark, TestSpark.sf001).collect()
      .map(r => (r.getInt(2), r.getInt(3))) // (min_x, max_x)
    val total = units.length
    // Predicate x ∈ one 16-wide grid slab: only units whose x-tile matches
    // can contain rows — at most 16 of the 256 possible units (the y-axis
    // tiles), vs ALL units under a y-sorted layout. This is the file-skip
    // the operator buys.
    val slabLo = 0; val slabHi = 15
    val touched = units.count { case (lo, hi) => hi >= slabLo && lo <= slabHi }
    info(s"x-slab [0,15] touches $touched of $total units")
    assert(touched <= 16, s"x-slab touched $touched units — z-locality broken")
    assert(touched < total, "slab touched every unit — no pruning at all")
  }

  test("stats-pruned READ: the x-slab answer comes from a minority of files, exactly") {
    import org.apache.spark.sql.functions._
    // The consumer loop the layout exists for, executed physically: answer
    // `xb ∈ [0, 15]` by consulting the per-file stats index (the metadata a
    // table format keeps), reading ONLY the overlapping files, and applying
    // the residual filter. Must (a) skip the majority of files — under a
    // y-sorted layout every file's x-extent spans ~the full axis and ZERO
    // files are skippable — and (b) return exactly the full-scan answer.
    val (dir, stats) = layout
    val (slabLo, slabHi) = (0, 15)
    val survivors = stats.collect {
      case (path, minX, maxX, _, _) if maxX >= slabLo && minX <= slabHi => path
    }
    info(s"stats pruned ${stats.length - survivors.length} of ${stats.length} files")
    assert(survivors.nonEmpty, "slab empty — fixture degenerate")
    assert(survivors.length * 2 <= stats.length,
      s"stats pruning kept ${survivors.length}/${stats.length} files — z-locality broken")
    def answer(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("xb").between(slabLo, slabHi))
        .agg(count(lit(1)), coalesce(sum(col("xb") * 1000 + col("yb")), lit(0L)))
        .collect()(0)
    val pruned = answer(spark.read.parquet(survivors: _*))
    val full = answer(spark.read.parquet(dir))
    assert(pruned == full,
      s"pruned read answered $pruned but full scan answered $full")
    assert(full.getLong(0) > 0, "slab matched no rows — assertion vacuous")
  }
}
