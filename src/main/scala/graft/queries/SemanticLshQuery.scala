package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.VectorOps

/** d16: BUCKETED semantic dedup — the 100-TB form of d10. d10's default
  * pair source is d5's exact tiled all-pairs scan: correct, and the right
  * recall oracle, but O(n²) dot products no matter how the tiles are cut.
  * This query is the d2→d4 candidate-then-verify pattern applied to
  * embeddings (SemDeDup at scale is exactly LSH-or-IVF-then-verify):
  *
  *   1. CANDIDATES: s2's sign-LSH construction — L independent tables of
  *      `nPlanes` seeded hyperplanes; each vector lands in one bucket per
  *      table, and the probe side additionally visits every bucket within
  *      Hamming radius `probeRadius`. A candidate pair is two vectors sharing
  *      a probed bucket in ANY table (canonical a < b on the probe side, so
  *      each pair surfaces once per colliding table/probe before DISTINCT).
  *   2. VERIFY: exact cosine (the codegen'd CosineSimilarity expression,
  *      bit-identical to the oracle's unrolled IEEE chain) ≥ the SAME 0.35
  *      threshold d5/d10 use — candidates only, never all-pairs.
  *   3. CLUSTER: the shared min-label propagation engine, through
  *      D10SemanticClusters.runOverPairs — identical semantics, component =
  *      min vec_id.
  *
  * Cost model at corpus scale: the bucketed self-join shuffles each vector
  * L·(1+nPlanes) probe rows (embedding carried once per table row, the s2
  * cost shape); per-bucket fan-in is the bucket population (n/2^nPlanes per
  * table), so nPlanes GROWS with the corpus to hold buckets bounded while L
  * and the probe radius buy recall — every knob is a constant here and an
  * argument in a deployment. Verification touches candidates only, and the
  * propagation working set is the verified pair list. No OPERATOR is
  * O(n²) — the candidate mass still is whenever the threshold carries no
  * signal (see THRESHOLD-REGIME HONESTY below).
  *
  * OPERATING POINT — 8 planes × 6 tables × radius 3 — is MEASURED, not
  * argued: the round-11 sf1-equivalent probe (SCALE_SLOPE_r11.json; 20k
  * vectors, 426k true pairs) ran this same chain at the old 4×3×r2 and at
  * 8×6×r3, and the widened config delivered HIGHER recall (99.80% vs
  * 99.64%) in 4.4× LESS wall. The mechanism: chance collisions fall
  * exponentially with the plane count (2^planes buckets), while tables and
  * probe radius buy recall back at linear cost — finer buckets + wider
  * probing dominates coarse buckets wherever bucket occupancy matters.
  * Sizing rule for other corpora: pick planes ≈ log2(n / target bucket
  * occupancy) (keep expected occupancy in the hundreds), then raise
  * tables/radius until the recall floor holds; all three are knobs of
  * [[verifiedPairsWith]], and D16CrossoverSpec runs the sweep through the
  * declared chain itself. The structural guarantee the plan pin holds is
  * what scales: candidates come from keyed equi-joins, never a quadratic
  * operator.
  *
  * THRESHOLD-REGIME HONESTY (round 14). Structure is not selectivity: on
  * THIS fixture the candidate MASS is still ~quadratic, because the 0.35
  * threshold sits in the random-cosine tail of random unit vectors
  * (per-plane agreement: signal 0.61 vs noise 0.50). Per table the
  * radius-3 probe accepts P(Binom(8, ½) ≤ 3) = 93/256 ≈ 36% of RANDOM
  * pairs; across 6 tables 1−(1−.36)⁶ ≈ 93% — measured exactly at the sf1
  * probe: 183.4M candidates of the 200.0M possible pairs (91.7%),
  * verifying down to 425k (SCALE_SLOPE_r14.json probes). At a 0.61-vs-0.50
  * gap NO sign-LSH config separates sub-quadratically at recall ≈ 1 (the
  * per-bit information is ~0.035 bits; code length would have to grow
  * faster than the noise-acceptance shrinks). Consequence, measured: the
  * exact tiled d5 form builds the same pair list in 3.1 s where this
  * chain spends 70.6 s (shared_big rows, SCALE_SLOPE_r14) — below the
  * threshold-signal crossover, all-pairs-with-tiny-constants beats
  * LSH-with-shuffled-candidates, which is WHY d5 stays in the engine as
  * more than an oracle. d16's regime is the production one: at real
  * near-dup thresholds (cosine ≥ 0.8 → per-plane 0.80 vs 0.50) per-table
  * noise acceptance at radius 2 is 14.5% and falls exponentially with
  * planes while signal capture stays high — there the same chain prunes
  * by orders of magnitude and the log2(n) sizing rule above applies.
  * EXECUTABLE: D16RegimeSpec plants 300 cosine≈0.95 clusters among 2 800
  * random vectors and runs THIS chain ([[verifiedPairsOver]]) at
  * threshold 0.8 with a 16×5×r2 config — measured candidates 1.57% of
  * all pairs (125 733 of 8.0M) at recall 0.9994, against the same
  * operator's 91.7% on the noise-threshold fixture. The fixture prices
  * the operator's floor, not its value; the emb-family slope gate
  * already judges these chains against the fixture's own quadratic
  * true-pair growth for the same reason.
  *
  * Recall: sign-LSH at cosine 0.35 (≈ 70°) is a hard regime — per-plane
  * agreement p ≈ 0.61, so one 8-plane table alone catches only p⁸ ≈ 2% of
  * true pairs; 6 tables × radius-3 multi-probe (93 of 256 buckets per
  * table) is what drives per-pair capture toward 1. COMPONENTS are why the
  * radius is generous: one missed bridge edge splits a cluster and erases
  * thousands of co-memberships (measured co-membership recall 0.57 at
  * radius 1 on 4-plane tables). Floors 0.90 for pair AND co-membership
  * recall vs exact d5/d10 are pinned in SemanticLshRecallSpec (the
  * AnnRecallSpec discipline), measured ≥0.99 at sf0.01 at this config.
  *
  * Determinism: bucket ids are integer sums of sign tests on inlined plane
  * constants (identical in both engines — s2's argument), the verify cosine
  * is the exactly-rounded unrolled chain (s1's argument), and min-label
  * fixpoints are unique — so the oracle's recursive-CTE closure over the
  * same candidate SQL reaches the identical component set.
  */
object D16SemanticLshClusters extends GraftQuery {
  val name = "d16_semantic_lsh"
  val describe = "bucketed semantic dedup: sign-LSH multi-probe candidates, exact cosine verify, min-label components"

  private val d = Embeddings.dims
  private[queries] val threshold = D5EmbedDedup.threshold

  /** The declared operating config — promoted to the MEASURED sf1-probe
    * optimum in round 12 (8×6×r3: 99.80% recall at 4.4× less wall than the
    * previous 4×3×r2; SCALE_SLOPE_r11.json). See the object scaladoc for
    * the sizing rule; [[verifiedPairsWith]] takes any (tables, masks).
    */
  private[queries] val nPlanes = 8
  private[queries] val nTables = 6
  private[queries] val probeRadius = 3
  private val tables = tablesFor(nPlanes, nTables)

  /** Probe masks: every bucket XOR mask of popcount ≤ radius (the identity
    * plus all 1-, 2-, 3-bit flips at radius 3 — 93 of an 8-plane table's
    * 256 buckets). A generous radius is what the CLUSTER surface requires:
    * a small per-pair miss rate is fine for top-k ANN but fatal for
    * connected components, where one missed BRIDGE edge splits a big
    * cluster and erases thousands of co-memberships (measured: radius-1
    * co-membership recall 0.57 on 4-plane tables).
    */
  private val probeMasks: Seq[Long] = probeMasksFor(nPlanes, probeRadius)

  def run(spark: SparkSession, sfDir: String): DataFrame =
    // The DEFAULT-config cluster table is itself a shared stage output:
    // d16 and v5 (cluster purity) both consume it, so an enabled run
    // executes the min-label propagation once, not once per consumer.
    // Non-default knobs (below) stay inline — experiment paths, not the
    // declared surface.
    graft.Materialize.table(spark, "d16_clusters", sfDir)(
      run(spark, sfDir, D7DupClusters.defaultEdgePartitions))

  def run(spark: SparkSession, sfDir: String, edgePartitions: Int,
      bucketSalts: Int = 1): DataFrame =
    D10SemanticClusters.runOverPairs(
      spark, verifiedPairs(spark, sfDir, bucketSalts).select(col("vec_a"), col("vec_b")),
      edgePartitions, name)

  /** Stage 1+2: LSH candidates → exact-cosine verified pairs (canonical
    * a < b, with the verified cosine — the d5-shaped contract, so g1/g2/d12
    * consumers can swap sources without reshaping).
    *
    * `bucketSalts > 1` routes the (table, bucket) candidate join through
    * [[graft.operators.Skew.saltedJoinOn]]: a template/boilerplate family
    * whose near-identical embeddings all land in ONE bucket makes that
    * single join key quadratic in family size — the d9 `joinSalts` hazard
    * in LSH form. Salting spreads the hot bucket's fan-out over
    * `bucketSalts` tasks; the candidate multiset (each probe-row × base-row
    * pair matches at exactly one salt) and therefore the verified pairs and
    * clusters are IDENTICAL (D16SaltedJoinSpec pins equality on a
    * one-hot-bucket fixture and the real corpus).
    */
  private[queries] def verifiedPairs(spark: SparkSession, sfDir: String,
      bucketSalts: Int = 1): DataFrame =
    // The default-salt pair list is a SHARED STAGE OUTPUT: d16 itself and
    // the g3/g4 graph consumers all start from it, so under an enabled
    // Materialize run the LSH+verify chain executes once, not three times.
    // Non-default salting stays inline (it is a skew experiment knob, not a
    // declared-query path).
    if (bucketSalts == 1)
      graft.Materialize.table(spark, "d16_verified_pairs", sfDir)(
        buildVerifiedPairs(spark, sfDir, 1))
    else buildVerifiedPairs(spark, sfDir, bucketSalts)

  private def buildVerifiedPairs(spark: SparkSession, sfDir: String,
      bucketSalts: Int): DataFrame =
    verifiedPairsWith(spark, sfDir, tables, probeMasks, bucketSalts)

  /** Probe masks for an arbitrary (nPlanes, radius): every bucket-id XOR
    * mask of popcount ≤ radius — [[probeMasks]] is exactly this at the
    * declared (nPlanes, probeRadius). The D16CrossoverSpec sweep uses it
    * to run the SAME chain at other plane counts.
    */
  private[queries] def probeMasksFor(nPlanes: Int, radius: Int): Seq[Long] =
    (0L until (1L << nPlanes)).filter(m => java.lang.Long.bitCount(m) <= radius)

  /** Seeded tables for an arbitrary (nPlanes, nTables) — seed schedule
    * extends the declared (42, 1042, 2042) sequence.
    */
  private[queries] def tablesFor(nPlanes: Int, nTables: Int): Seq[Seq[Seq[Double]]] =
    (0 until nTables).map(i => VectorOps.hyperplanes(nPlanes, d, 42L + 1000L * i))

  /** The full candidates→verify chain over EXPLICIT tables/probe masks —
    * the declared query binds the measured (8 planes × 6 tables × radius
    * 3) operating point; the crossover spec binds other shapes. One
    * implementation, so the knob experiment exercises the real operator,
    * not a model of it.
    */
  private[queries] def verifiedPairsWith(spark: SparkSession, sfDir: String,
      tables: Seq[Seq[Seq[Double]]], probeMasks: Seq[Long],
      bucketSalts: Int = 1): DataFrame =
    verifiedPairsOver(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      tables, probeMasks, bucketSalts, threshold)

  /** The same chain over an EXPLICIT (vec_id, embedding) frame and
    * threshold — so the threshold-regime demonstration (D16RegimeSpec) can
    * run the DECLARED operator, not a model of it, over planted near-dup
    * clusters at a production threshold. The sfDir overload binds the
    * declared table and the d5 threshold.
    */
  private[queries] def verifiedPairsOver(spark: SparkSession, embIn: DataFrame,
      tables: Seq[Seq[Seq[Double]]], probeMasks: Seq[Long],
      bucketSalts: Int, minCos: Double): DataFrame = {
    org.apache.spark.sql.graft.DotProduct.register(spark)
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val emb = embIn.select(col("vec_id"), col("embedding"))
    val cand = candidatePairsOver(spark, emb, tables, probeMasks, bucketSalts)
    val cos = org.apache.spark.sql.graft.CosineSimilarity.cosineSimilarity(
      col("ea.embedding"), col("eb.embedding"))
    cand
      .join(emb.alias("ea"), col("vec_a") === col("ea.vec_id"))
      .join(emb.alias("eb"), col("vec_b") === col("eb.vec_id"))
      .select(col("vec_a"), col("vec_b"), cos.as("cos"))
      .filter(col("cos") >= minCos)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
  }

  /** Candidate stage alone (distinct (vec_a, vec_b) bucket collisions) —
    * the quantity the plane-count crossover is ABOUT: candidates are what
    * the verify stage pays for, so the knob experiment counts them here,
    * on the same code path the declared query runs.
    */
  private[queries] def candidatePairsWith(spark: SparkSession, sfDir: String,
      tables: Seq[Seq[Seq[Double]]], probeMasks: Seq[Long],
      bucketSalts: Int = 1): DataFrame =
    candidatePairsOver(spark,
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding")),
      tables, probeMasks, bucketSalts)

  private[queries] def candidatePairsOver(spark: SparkSession, embIn: DataFrame,
      tables: Seq[Seq[Seq[Double]]], probeMasks: Seq[Long],
      bucketSalts: Int): DataFrame = {
    require(bucketSalts >= 1, s"bucketSalts must be >= 1, got $bucketSalts")
    org.apache.spark.sql.graft.DotProduct.register(spark)
    val emb = embIn.select(col("vec_id"), col("embedding"))
    val e = emb.select(
      col("vec_id") +:
        tables.zipWithIndex.map { case (p, t) =>
          VectorOps.lshBucketFused(col("embedding"), p).as(s"b$t")
        }: _*)
    val tb = explode(array(tables.indices.map(t =>
      struct(lit(t).as("t"), col(s"b$t").as("bucket"))): _*)).as("tb")
    // IDs AND BUCKETS ONLY through the fan-out stage: the probe explode
    // multiplies every vector |tables|×|probes| times and the bucket join
    // multiplies again by bucket occupancy, so the embedding payload must
    // not ride through either (the d11 "payload never shuffles" rule).
    // PERSISTED (round 15): both join sides — the probe explode and the
    // bucket side — derive from this frame through DIFFERENT exchanges
    // ((t, probe) vs (t, bucket)), so without the cache the 48-hyperplane
    // bucket projection over the embeddings scan executed TWICE per build
    // (~0.7 s per pass at sf0.1, D16StageProbe). The frame is n·|tables|
    // rows of three longs — the standard multi-consumer persist (the
    // t8/d4 rule), tiny at any corpus size relative to the scan it saves.
    val nLong = graft.CacheScope.persisted(
      e.select(col("vec_id"), tb)
        .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket")))
    val probes = explode(array(probeMasks.map(m =>
      col("bucket").bitwiseXOR(lit(m))): _*))
    val pLong = nLong
      .select(col("vec_id"), col("t"), probes.as("probe"))
    // DISTINCT before verify: a pair collides in up to |tables|×|probes|
    // buckets (558 at the declared 6×93), so collision multiplicity is
    // high for genuinely similar vectors; deduping 16-byte id pairs first
    // means the 128-dim cosine runs once per candidate PAIR, not once per
    // collision (measured 10.8 → ~4 s on the old 4-plane config at sf0.1).
    // The survivor set is identical either way — cosine is a pure pair
    // function.
    // Disambiguated column names so the optional salted route can take a
    // plain Column condition (Skew.saltedJoinOn contract).
    val pR = pLong.select(col("vec_id").as("pid"), col("t").as("pt"), col("probe"))
    val nR = nLong.select(col("vec_id").as("nid"), col("t").as("nt"), col("bucket"))
    val cond = col("pt") === col("nt") && col("probe") === col("bucket") &&
      col("pid") < col("nid")
    val joined =
      if (bucketSalts <= 1) pR.join(nR, cond)
      else graft.operators.Skew.saltedJoinOn(pR, nR, cond, bucketSalts)
    joined
      .select(col("pid").as("vec_a"), col("nid").as("vec_b"))
      .distinct()
  }

  /** The LSH-candidates→exact-verify chain as DuckDB CTEs, final CTE `ver`
    * holding the verified pair list (vec_a < vec_b) — the SQL mirror of
    * [[verifiedPairs]], factored out so pair-graph consumers (g3's PageRank)
    * can compose their oracle over the bucketed source exactly as their
    * Spark side composes over [[verifiedPairs]] (the
    * `D5EmbedDedup.pairsCtesSql` precedent).
    */
  private[queries] val pairsCtesSql: String = {
    val vcos = s"(${VectorOps.dotSql("a.embedding", "b.embedding", d)}) / (a.nrm * b.nrm)"
    val bucketCols = tables.zipWithIndex
      .map { case (p, t) => s"CAST(${VectorOps.lshBucketSql("embedding", p)} AS BIGINT) AS b$t" }
      .mkString(",\n         ")
    val nl = tables.indices
      .map(t => s"SELECT vec_id, $t AS t, b$t AS bucket FROM e")
      .mkString("\n  UNION ALL ")
    val probeList = probeMasks.map {
      case 0L => "bucket"
      case m => s"xor(bucket, $m)"
    }.mkString(", ")
    // MATERIALIZED (DuckDB-side only — no Spark ever parses this SQL):
    // without it DuckDB INLINES each multiply-referenced CTE, duplicating
    // the 6-table × 8-plane × 128-dim inlined-constant bucket expressions
    // into every consumer branch and spending ~50 s PLANNING a query whose
    // data is tiny (measured 48.2 s → 1.3 s at sf0.001, identical rows).
    s"""e AS MATERIALIZED (
       |  SELECT vec_id, embedding, ${VectorOps.normSql("embedding", d)} AS nrm,
       |         $bucketCols
       |  FROM embeddings),
       |nl AS MATERIALIZED (
       |  $nl
       |),
       |pl AS MATERIALIZED (SELECT vec_id, t, unnest([$probeList]) AS probe FROM nl),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT p.vec_id AS vec_a, n.vec_id AS vec_b
       |  FROM pl p JOIN nl n
       |    ON p.t = n.t AND p.probe = n.bucket AND p.vec_id < n.vec_id),
       |ver AS MATERIALIZED (
       |  SELECT c.vec_a, c.vec_b
       |  FROM cand c JOIN e a ON c.vec_a = a.vec_id JOIN e b ON c.vec_b = b.vec_id
       |  WHERE $vcos >= $threshold)""".stripMargin
  }

  val oracle = Some(
    s"""WITH RECURSIVE $pairsCtesSql,
       |edges AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM ver
       |  UNION ALL SELECT vec_b, vec_a FROM ver),
       |lab AS (
       |  SELECT DISTINCT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e2.dst, l.label FROM lab l JOIN edges e2 ON l.node = e2.src)
       |SELECT node AS vec_id, min(label) AS component
       |FROM lab GROUP BY node""".stripMargin)
}
