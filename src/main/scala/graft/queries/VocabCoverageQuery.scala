package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

/** t27: vocabulary COVERAGE curve — for each vocab budget k, what fraction
  * of corpus token OCCURRENCES the k most frequent types cover. This is the
  * table a tokenizer team reads before fixing a vocab size (the OOV rate at
  * each budget is `1 − coverage`): t6 shows the head of the vocabulary,
  * t16 fits its power law, t12 trains the merges — t27 answers "how big
  * must the vocabulary BE", the budget decision upstream of all three.
  *
  * Output: one row per budget — (budget, n_types, covered, total, oov_e9)
  * with n_types = min(budget, |vocab|), covered/total exact occurrence
  * counts, and oov_e9 = round((1 − covered/total)·1e9): one exactly-rounded
  * IEEE division of exact integers, so the gate compares identical LONGs.
  *
  * Scale: the frequency table is vocabulary-bounded (map-side-combined
  * token count — the t6 shape); ranking the vocabulary uses
  * [[graft.operators.Rank.globalRowNumber]] (range-partitioned distributed
  * sort + broadcast O(P) offsets — NEVER a single-partition window, because
  * a web-scale vocabulary is itself hundreds of millions of types); the
  * 5-row budget dim broadcasts into the ranked vocab and one ≤5-key
  * aggregate emits the curve. Nothing corpus-sized shuffles twice.
  */
object T27VocabCoverage extends GraftQuery {
  val name = "t27_vocab_coverage"
  val describe = "tokenizer-budget curve: corpus occurrence coverage + OOV rate at each vocab size"

  private[queries] val budgets = Seq(64L, 256L, 1024L, 4096L, 16384L)

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
    val ranked = graft.operators.Rank.globalRowNumber(
      counts, Seq(col("freq").desc, col("tok").asc),
      spark.sparkContext.defaultParallelism)
    val budgetDim = spark.createDataFrame(budgets.map(Tuple1(_))).toDF("budget")
    ranked.crossJoin(broadcast(budgetDim))
      .groupBy(col("budget"))
      .agg(
        sum(when(col("rk") <= col("budget"), 1L).otherwise(0L)).as("n_types"),
        sum(when(col("rk") <= col("budget"), col("freq")).otherwise(0L)).as("covered"),
        sum(col("freq")).as("total"))
      .select(col("budget"), col("n_types"), col("covered"), col("total"),
        round((lit(1.0) - col("covered").cast("double") / col("total").cast("double")) * 1e9)
          .cast("long").as("oov_e9"))
  }

  val oracle = Some(
    s"""WITH tok AS (SELECT unnest(${TextOps.tokensSql("text")}) AS tok FROM documents),
       |c AS (SELECT tok, count(*) AS freq FROM tok GROUP BY tok),
       |r AS (SELECT tok, freq,
       |             row_number() OVER (ORDER BY freq DESC, tok ASC) AS rk FROM c),
       |b AS (SELECT CAST(unnest([${budgets.mkString(", ")}]) AS BIGINT) AS budget)
       |SELECT b.budget,
       |       CAST(sum(CASE WHEN r.rk <= b.budget THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
       |       CAST(sum(CASE WHEN r.rk <= b.budget THEN r.freq ELSE 0 END) AS BIGINT) AS covered,
       |       CAST(sum(r.freq) AS BIGINT) AS total,
       |       CAST(round((1.0 - CAST(sum(CASE WHEN r.rk <= b.budget THEN r.freq ELSE 0 END) AS DOUBLE)
       |                        / CAST(sum(r.freq) AS DOUBLE)) * 1e9) AS BIGINT) AS oov_e9
       |FROM r CROSS JOIN b
       |GROUP BY b.budget""".stripMargin)
}
