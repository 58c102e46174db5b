package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** v6: semi-supervised LABEL PROPAGATION over the d16 semantic-pair graph —
  * the iterative generalization of v2's one-hop kNN transfer: labels spread
  * from a curated seed slice along verified near-duplicate edges, so a
  * label reaches vectors the seeds never directly touch (through chains of
  * semantic duplicates), which is exactly how weak supervision covers the
  * long tail of a corpus a 25% curated slice can't reach in one hop.
  *
  * Semantics (the hard-clamp variant of Zhu & Ghahramani 2002's label
  * propagation, made engine-exact): seeds = `vec_id % 4 == 0` keep their
  * true label forever (round 0); then ROUNDS synchronous rounds, each
  * labeling every still-unlabeled node that has ≥1 labeled neighbour with
  * the MAJORITY label among its labeled neighbours (integer edge votes,
  * ties to the smaller label — the v2 vote rule). Once labeled, clamped:
  * later rounds never rewrite a label, so every assignment is attributable
  * to the round that made it (`round` column = provenance). Fixed round
  * count, not convergence detection: the unrolled oracle must replay the
  * identical schedule, and 3 rounds ≥ the duplicate-cluster diameters seen
  * in practice (d7's 2–4-round observation).
  *
  * Scale shape: the working set is d16's verified PAIR list — the shared
  * `d16_verified_pairs` stage (built once for d16/g3/g4/v6), orders of
  * magnitude smaller than the corpus. Each round is one edge⋈labels key
  * join + a (node, label) count + an argmax window BOUNDED by the label
  * vocabulary per node — never a corpus-wide window — plus an anti-join
  * clamp. Per-round frames are persisted and the loop is a driver loop (the
  * kernel's A6 shape); 3 rounds keep the unrolled plan constant-size, so no
  * RDD lineage truncation is needed (the d7 rule kicks in only for
  * unbounded loops).
  *
  * Oracle: the same three rounds unrolled as CTEs over the identical
  * bucketed pair chain (`D16SemanticLshClusters.pairsCtesSql`) — integer
  * votes and the (votes desc, label asc) tie rule make every round
  * bit-exact across engines.
  */
object V6LabelPropagation extends GraftQuery {
  val name = "v6_label_propagation"
  val describe = "label propagation over d16's verified pairs: 3 clamped majority-vote rounds from a 25% seed slice"

  private[queries] val seedMod = 4
  private[queries] val rounds = 3

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = D16SemanticLshClusters.verifiedPairs(spark, sfDir)
      .select(col("vec_a"), col("vec_b"))
    val edges = graft.CacheScope.persisted(
      pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
        .union(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst"))))
    val seeds = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(seedMod)) === 0)
      .select(col("vec_id"), col("label"), lit(0).as("round"))
    val argmax = Window.partitionBy(col("vec_id"))
      .orderBy(col("votes").desc, col("label").asc)
    var labels = graft.CacheScope.persisted(seeds)
    // DELTA vote join (round 15): the vote side joins only the PREVIOUS
    // round's newly-labeled nodes, not the whole label table — and this is
    // EXACT, not an approximation: the clamp rule labels every node with
    // ≥ 1 labeled neighbour, so a node still unlabeled at the start of
    // round r had zero neighbours labeled before round r−1 (any such
    // neighbour would have labeled it in an earlier round) — its labeled
    // neighbours are therefore exactly the round-(r−1) cohort, and the
    // per-(node, label) vote counts over that cohort equal the full-table
    // counts. The anti-join clamp still checks the FULL label table. Same
    // fixpoint, same per-round assignments, same `round` provenance; the
    // per-round join mass drops from O(all labels) to O(last round's
    // additions) — the ConnectedComponents delta argument applied to
    // propagation votes.
    var prevNewly = labels
    for (r <- 1 to rounds) {
      val newly = graft.CacheScope.persisted(edges
        .join(prevNewly.select(col("vec_id").as("src"), col("label")), "src")
        .join(labels.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
        .groupBy(col("dst").as("vec_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
        .withColumn("rn", row_number().over(argmax))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), lit(r).as("round")))
      labels = graft.CacheScope.persisted(labels.union(newly))
      prevNewly = newly
    }
    labels
  }

  val oracle = {
    val roundCtes = (1 to rounds).map { r =>
      s"""v$r AS (
         |  SELECT e.dst AS vec_id, l.label, count(*) AS votes
         |  FROM l${r - 1} l JOIN edges e ON l.vec_id = e.src
         |  WHERE e.dst NOT IN (SELECT vec_id FROM l${r - 1})
         |  GROUP BY 1, 2),
         |n$r AS (
         |  SELECT vec_id, label, $r AS round FROM (
         |    SELECT vec_id, label,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY votes DESC, label ASC) AS rn
         |    FROM v$r)
         |  WHERE rn = 1),
         |l$r AS MATERIALIZED (SELECT * FROM l${r - 1} UNION ALL SELECT * FROM n$r)""".stripMargin
    }.mkString(",\n")
    Some(
      s"""WITH ${D16SemanticLshClusters.pairsCtesSql},
         |edges AS MATERIALIZED (
         |  SELECT vec_a AS src, vec_b AS dst FROM ver
         |  UNION ALL SELECT vec_b, vec_a FROM ver),
         |l0 AS MATERIALIZED (
         |  SELECT vec_id, label, 0 AS round FROM embeddings WHERE vec_id % $seedMod = 0),
         |$roundCtes
         |SELECT vec_id, label, round FROM l$rounds""".stripMargin)
  }
}
