package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** t18: cross-SOURCE shingle-overlap matrix — for every ordered source pair
  * (a, b), the fraction of a's distinct content 3-grams that also occur
  * anywhere in b. The source-level companion of t17's per-source corpus
  * card and d9's per-document contamination: where d9 asks "is this eval
  * document inside the training set?", this asks "how much of feed A is
  * boilerplate shared with feed B?" — the table a corpus curator reads
  * before deciding which overlapping source to drop or down-weight (two
  * crawls of the same site show up as a high off-diagonal cell long before
  * per-document dedup runs).
  *
  * Shape at scale: reuses the hashed-shingle pipeline (one md5 per token —
  * the d2/d3/d4/d9 frame); each source collapses to its DISTINCT
  * (source, shingle) set, bounded by content volume; the overlap is one
  * self-join keyed on the shingle hash whose per-key fan-out is at most
  * |sources|² (a CONSTANT — sources are feeds, not documents), followed by
  * one grouped count. Totals are a |sources|-row broadcast. Nothing is
  * O(docs²) and no row ever carries text.
  *
  * Determinism: pure integer counts; the only division is the final rounded
  * fraction on identical (shared, total) integers in both engines. The
  * diagonal (a = a) is exactly 1 by construction — kept as the built-in
  * sanity anchor.
  */
object T18SourceOverlap extends GraftQuery {
  val name = "t18_source_overlap"
  val describe = "cross-source shingle-containment matrix: fraction of each source's 3-grams present in every other source"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    // Round 15: `source` rides the shingle projection itself instead of a
    // second documents scan re-joined on doc_id — one less scan and one
    // less join for the identical distinct (source, sh) set.
    // Round 16 (guide §2.4): the per-shingle distinct source SET is
    // collected in ONE grouped pass (collect_set subsumes the old
    // `.distinct()` — same exchange, same dedup, no second pass), and both
    // the totals and the full ordered source-pair matrix explode from that
    // small cached frame — replacing the distinct exchange plus BOTH
    // self-join sides with a single shuffle of the (source, sh) rows. Per
    // shingle each source appears once in the set, so the double explode
    // emits every ordered (a, b) pair — diagonal included — exactly once,
    // the self-join's multiset.
    val docs = Tables.documents(spark, sfDir)
    val lists = graft.CacheScope.persisted(
      docs.select(col("source"), TextOps.tokenHashes(TextOps.tokens(col("text"))).as("ht"))
        .select(col("source"),
          explode(array_distinct(TextOps.shingleHashes(col("ht"), 3))).as("sh"))
        .groupBy(col("sh")).agg(collect_set(col("source")).as("ss")))
    val totals = lists.select(explode(col("ss")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_total"))
    val shared = lists
      .select(explode(col("ss")).as("source_a"), col("ss"))
      .select(col("source_a"), explode(col("ss")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(totals.withColumnRenamed("source", "source_a")), "source_a")
      .select(col("source_a"), col("source_b"), col("n_shared"), col("n_total"),
        round(col("n_shared").cast("double") / col("n_total"), 6).as("containment"))
  }

  val oracle = Some(
    s"""WITH ${TextOps.shingleHashSetsSql(3)},
       |ss AS MATERIALIZED (
       |  SELECT DISTINCT d.source, t.sh
       |  FROM (SELECT doc_id, unnest(shs) AS sh FROM shs) t
       |  JOIN documents d ON t.doc_id = d.doc_id),
       |totals AS (SELECT source, count(*) AS n_total FROM ss GROUP BY source),
       |shared AS (
       |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
       |  FROM ss a JOIN ss b ON a.sh = b.sh
       |  GROUP BY 1, 2)
       |SELECT s.source_a, s.source_b, s.n_shared, t.n_total,
       |       round(CAST(s.n_shared AS DOUBLE) / t.n_total, 6) AS containment
       |FROM shared s JOIN totals t ON s.source_a = t.source""".stripMargin)
}

/** d17: asymmetric CONTAINMENT dedup — pairs where one document's shingle
  * set is (nearly) a subset of the other's: c(A→B) = |S(A)∩S(B)| / |S(A)|.
  * This is the sub/super-duplicate case the whole Jaccard family
  * structurally misses: a paragraph quoted inside a 100× longer page has
  * Jaccard ≈ 1% (d4 never flags it, and d2's MinHash-LSH — whose collision
  * probability IS Jaccard — never even surfaces it as a candidate), yet its
  * containment is ≈ 1 and a training pipeline that keeps both feeds the
  * model the same paragraph twice. RefinedWeb/Dolma-style curation runs
  * exactly this check alongside near-dedup.
  *
  * Candidates cannot come from MinHash here (see above), so the generator
  * is the d9/d11 shape: join the exploded shingle frame with itself on the
  * shingle hash. The fan-out control is a STOP-SHINGLE cap — shingles
  * occurring in more than `maxDf` documents are dropped from the UNIVERSE
  * before any pairing (df is one grouped count; the filter runs on both the
  * intersection AND the denominators, so containment semantics stay
  * consistent: "containment over informative shingles"). A corpus-frequent
  * shingle contributes O(df²) candidate rows while carrying no dedup signal
  * — it is boilerplate, which is t18's business, not a duplication witness;
  * capping df bounds every join key's fan-out at maxDf² — at any corpus
  * size the worst key costs the same, which is what makes the shape safe at
  * 100 TB (the d9 salting lever remains available below the cap).
  *
  * Determinism: integer counts and rounded divisions on identical integers;
  * the flag compares exact integer products (n_inter·10 ≥ 8·n_a form is
  * avoided by comparing the ROUNDED fraction against the threshold — both
  * engines round the same integers identically).
  */
object D17Containment extends GraftQuery {
  val name = "d17_containment"
  val describe = "asymmetric containment dedup: near-subset shingle pairs (with stop-shingle df cap) that Jaccard misses"

  /** Report pairs whose larger directional containment reaches this. */
  private[queries] val threshold = 0.8
  /** Stop-shingle cap: shingles in more than this many docs leave the
    * universe (fan-out bound maxDf² per join key).
    */
  private[queries] val maxDf = 50
  /** d4's verify threshold — pairs below it are invisible to the Jaccard
    * path, flagged `jaccard_missed`.
    */
  private val jaccardThreshold = 0.3

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    // Round 16 (guide §2.4 + §4.1): ONE grouped pass replaces the df-count
    // join and BOTH self-join sides. Each shingle's distinct doc_id list is
    // collected once (the (doc_id, sh) frame crosses one exchange instead
    // of three), the df ≤ maxDf stop-shingle cap becomes a size() filter on
    // the collected list, and the pair stream is the codegen'd
    // OrderedPairs × inline generators — the identical pair multiset the
    // `a.sh = b.sh AND a.doc_id < b.doc_id` join emitted (ids are distinct
    // per shingle since shs is array_distinct per doc; OrderedPairsSpec
    // pins the multiset equality). The r15 HOF attempt at this rewrite
    // lost to interpreted lambdas; the native expression is the fix.
    val ex = graft.CacheScope.persisted(
      TextOps.shingleHashSets(Tables.documents(spark, sfDir))
        .select(col("doc_id"), explode(col("shs")).as("sh")))
    val lists = graft.CacheScope.persisted(
      ex.groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ids"))
        .filter(size(col("ids")) <= maxDf)
        .select(col("ids")))
    val sizes = lists.select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = lists
      .select(inline(org.apache.spark.sql.graft.OrderedPairs.orderedPairsCol(col("ids"))))
      .groupBy(col("a").as("doc_a"), col("b").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val cA = round(col("n_inter").cast("double") / col("na"), 6)
    val cB = round(col("n_inter").cast("double") / col("nb"), 6)
    val jac = round(col("n_inter").cast("double") / (col("na") + col("nb") - col("n_inter")), 6)
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        cA.as("containment_a"), cB.as("containment_b"), jac.as("jaccard"),
        (jac < jaccardThreshold).as("jaccard_missed"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= threshold)
  }

  val oracle = Some(
    s"""WITH ${TextOps.shingleHashSetsSql(3)},
       |ex AS MATERIALIZED (SELECT doc_id, unnest(shs) AS sh FROM shs),
       |df AS (SELECT sh, count(*) AS df FROM ex GROUP BY sh),
       |inf AS MATERIALIZED (SELECT e.doc_id, e.sh FROM ex e JOIN df ON e.sh = df.sh WHERE df.df <= $maxDf),
       |sizes AS (SELECT doc_id, count(*) AS n FROM inf GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
       |  FROM inf a JOIN inf b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT i.doc_a, i.doc_b, i.n_inter,
       |         round(CAST(i.n_inter AS DOUBLE) / sa.n, 6) AS containment_a,
       |         round(CAST(i.n_inter AS DOUBLE) / sb.n, 6) AS containment_b,
       |         round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
       |  FROM inter i
       |  JOIN sizes sa ON i.doc_a = sa.doc_id
       |  JOIN sizes sb ON i.doc_b = sb.doc_id)
       |SELECT doc_a, doc_b, n_inter, containment_a, containment_b, jaccard,
       |       (jaccard < $jaccardThreshold) AS jaccard_missed
       |FROM scored
       |WHERE greatest(containment_a, containment_b) >= $threshold""".stripMargin)
}
