package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** t26: filter DISAGREEMENT audit — the table behind k4's design premise
  * ("pipelines run both filters"): the generative CCNet filter (t19 —
  * "is this text probable under a reference-trained LM?") crossed with the
  * discriminative classifier's verdict at its chosen operating point (k4's
  * score ≥ k5's argmax-F1 threshold — "can a trained discriminator tell it
  * from reference text?"). Per (LM tercile, classifier verdict) cell:
  * document count, mean classifier score, mean LM log-prob. The OFF-
  * DIAGONAL cells are the deliverable — head-but-drop is reference-like
  * text the classifier distrusts (classifier feature gap), tail-but-keep
  * is LM-improbable text the classifier accepts (LM coverage gap); both
  * are exactly the review queues a filter team triages before shipping a
  * corpus, and the cell counts are the sizes of those queues.
  *
  * Composition: three published stages, one definition each — t19's
  * bucketed frame (now a shared Materialize stage, `t19_buckets`), k4's
  * scored frame (`k4_scored`), and k5's sweep for the threshold (k7's
  * construction). The oracle composes the same three factored CTE chains
  * — t19's prefix-parameterized `filterCtesSql` beside k4's `scoredCte`
  * and k5's `evalCtesSql` (the prefix exists precisely because k5's
  * thresholds CTE and t19's token CTE both wanted the name `th`).
  *
  * Engine-exactness: the join key is doc_id; bucket strings come from
  * integer rank comparisons; clf_keep compares identical rounded-6 doubles
  * to the identical sweep threshold (k7's argument); means are the
  * order-independent exactAvg on both sides.
  *
  * Scale: both upstream chains are the audited linear pipelines; this
  * stage adds one doc-keyed equi-join, a broadcast 1-row threshold, and a
  * ≤6-key aggregate with map-side partials — O(6 × partitions) shuffle on
  * top of work that already ran.
  */
object T26FilterAgreement extends GraftQuery {
  val name = "t26_filter_agreement"
  val describe = "generative-vs-discriminative filter disagreement: t19 tercile x k4 verdict cells with mean scores"

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val lm = T19LmFilter.run(spark, sfDir)
      .select(col("doc_id"), col("avg_logp"), col("bucket"))
    val clf = K4QualityClassifier.run(spark, sfDir)
      .select(col("doc_id"), col("score"))
    val best = K5ClassifierEval.run(spark, sfDir)
      .orderBy(col("f1").desc, col("threshold").asc)
      .limit(1)
      .select(col("threshold").as("thr"))
    lm.join(clf, "doc_id")
      .crossJoin(broadcast(best))
      .groupBy(col("bucket"), (col("score") >= col("thr")).as("clf_keep"))
      .agg(count(lit(1)).as("n_docs"),
        graft.functions.Rounding.exactAvg(col("score"), 6).as("mean_score"),
        graft.functions.Rounding.exactAvg(col("avg_logp"), 6).as("mean_logp"))
  }

  val oracle = Some(
    s"""WITH ${K4QualityClassifier.scoredCte("sc")},
       |${K5ClassifierEval.evalCtesSql},
       |best AS (SELECT threshold AS thr FROM ev ORDER BY f1 DESC, threshold ASC LIMIT 1),
       |${T19LmFilter.filterCtesSql("lm", "fb")}
       |SELECT fb.bucket, (sc.score >= b.thr) AS clf_keep,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       ${graft.functions.Rounding.exactAvgSql("sc.score", 6)} AS mean_score,
       |       ${graft.functions.Rounding.exactAvgSql("fb.avg_logp", 6)} AS mean_logp
       |FROM fb JOIN sc ON fb.doc_id = sc.doc_id CROSS JOIN best b
       |GROUP BY 1, 2""".stripMargin)
}
