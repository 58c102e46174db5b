package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Executable form of the d16 scaladoc's THRESHOLD-REGIME claim: the same
  * declared LSH chain that accepts 91.7% of all pairs as candidates on the
  * fixture's 0.35-in-the-noise threshold (SCALE_SLOPE_r14 probes) PRUNES BY
  * ORDERS OF MAGNITUDE in the production near-dup regime — planted clusters
  * at cosine ≈ 0.9, verify threshold 0.8, a 16-plane × 5-table × radius-2
  * config per the log2(n) sizing rule. Binomial expectations being pinned:
  * noise acceptance per table P(Binom(16,½) ≤ 2) = 137/65536 ≈ 0.21%
  * (≈1% over 5 tables) vs per-pair signal capture ≈ 0.99.
  *
  * Runs [[D16SemanticLshClusters.verifiedPairsOver]] — the declared
  * operator over an explicit frame, not a model of it.
  */
class D16RegimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("production regime: planted near-dups at cos>=0.8 — candidates prune >20x, recall >= 0.95, exact precision") {
    import spark.implicits._
    val d = Embeddings.dims
    val rnd = new scala.util.Random(7)
    def gauss(): Array[Double] = Array.fill(d)(rnd.nextGaussian())
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    // 300 clusters x 4 members at eps=0.03 (pairwise cos ~ 1/(1+eps^2 d)
    // ~ 0.90) + 2800 random singletons (cross cosines ~ N(0, d^-1/2), never
    // near 0.8). All vectors unit-normalized Array[Float].
    val clusters = (0 until 300).map { c =>
      val base = unit(gauss())
      c -> (0 until 4).map { _ =>
        unit(base.zip(gauss()).map { case (b, g) => b + 0.03 * g })
      }
    }
    val members = clusters.flatMap { case (c, vs) =>
      vs.zipWithIndex.map { case (v, i) => (c.toLong * 4 + i, c, v) }
    }
    val singles = (0 until 2800).map(i => (1200L + i, -1 - i, unit(gauss())))
    val all = (members ++ singles).map { case (id, c, v) => (id, c, v) }
    val emb = all.map { case (id, _, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

    val n = all.size.toLong
    val nPairs = n * (n - 1) / 2
    val tables = D16SemanticLshClusters.tablesFor(16, 5)
    val masks = D16SemanticLshClusters.probeMasksFor(16, 2)

    val candidates = D16SemanticLshClusters
      .candidatePairsOver(spark, emb, tables, masks, 1).count()
    // the pruning claim: ~1% of all pairs at this regime, vs the measured
    // 91.7% on the 0.35-threshold fixture — assert a conservative 20x
    assert(candidates * 20 < nPairs,
      f"candidates $candidates of $nPairs pairs (${candidates.toDouble / nPairs}%.4f) — no pruning")
    info(f"candidates: $candidates of $nPairs pairs (${100.0 * candidates / nPairs}%.2f%%)")

    val verified = D16SemanticLshClusters
      .verifiedPairsOver(spark, emb, tables, masks, 1, 0.80)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // ground truth: exact cosine over the SAME-CLUSTER pairs (driver-side,
    // 1800 pairs); the planting makes cross-cluster >= 0.8 impossible, and
    // precision is structural (the verify stage is exact) — asserted anyway.
    val byId = all.map { case (id, _, v) => id -> v }.toMap
    val cluster = all.collect { case (id, c, _) if c >= 0 => id -> c }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = a.zip(b).map { case (x, y) => x * y }.sum
    val truth = for {
      (c, vs) <- clusters; i <- 0 until 4; j <- (i + 1) until 4
      a = c.toLong * 4 + i; b = c.toLong * 4 + j
      if cos(byId(a), byId(b)) >= 0.80
    } yield (a, b)
    assert(truth.size > 1500, s"fixture degenerate: only ${truth.size} true pairs")
    val hit = truth.count(verified.contains)
    val recall = hit.toDouble / truth.size
    assert(recall >= 0.95, f"recall $recall%.4f below the 0.95 floor (${truth.size - hit} misses)")
    info(f"recall: $recall%.4f over ${truth.size} planted pairs")
    verified.foreach { case (a, b) =>
      assert(cluster.get(a).exists(c => cluster.get(b).contains(c)),
        s"verified pair ($a,$b) crosses clusters — planting broken or verify wrong")
    }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
