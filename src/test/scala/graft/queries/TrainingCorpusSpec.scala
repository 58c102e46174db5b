package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** p4 composition invariants — the stage-boundary properties the per-stage
  * oracles (p1/p2/p3) can't see. Value-level correctness is the DuckDB gate;
  * these pin that the stages were chained on the right frames.
  */
class TrainingCorpusSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private lazy val sf = graft.TestSpark.sf0001

  private lazy val p4 = P4TrainingCorpus.run(spark, sf).cache()
  private lazy val disp = P1CleanCorpus.run(spark, sf).cache()

  test("every packed doc is a p1 'kept' survivor (dropped docs never reach packing)") {
    val nonKept = p4.join(
      disp.filter(col("status") =!= "kept").select(col("doc_id")), "doc_id").count()
    assert(nonKept == 0L)
    assert(p4.count() > 0)
  }

  test("quota base is the KEPT set, not the raw corpus") {
    // p3 over the raw corpus uses budget = |corpus| div 2; p4's budget must
    // be |kept| div 2 — strictly smaller here because p1 drops docs. The
    // total sampled count equals the sum of per-source kept-set quotas.
    val kept = disp.filter(col("status") === "kept").select(col("doc_id"))
    val keptN = kept.count()
    val corpusN = disp.count()
    assert(keptN < corpusN, "fixture must drop something for this pin to bite")
    val perSource = p4.groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keptBySource = graft.Tables.documents(spark, sf).join(kept, "doc_id")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // .toSeq first: keys is a Set and mapping to weights would dedup them.
    val totalW = keptBySource.keys.toSeq.map(s => s.drop(3).toLong % 4 + 1).sum
    for ((src, n) <- perSource) {
      val w = src.drop(3).toLong % 4 + 1
      val quota = (keptN / P3MixtureSample.budgetDiv) * w / totalW
      assert(n == math.min(quota, keptBySource(src)),
        s"$src: packed $n, expected min(quota=$quota, kept=${keptBySource(src)})")
    }
  }

  test("token mass is conserved through packing (chunk ids cover exactly the stream)") {
    val row = p4.agg(
      sum(col("n_tokens")).as("total"),
      max(col("end_chunk")).as("last")).collect()(0)
    val total = row.getLong(0)
    val last = row.getLong(1)
    assert(last == (total - 1) / P2SequencePack.seqLen,
      s"last chunk $last inconsistent with $total total tokens")
  }
}
