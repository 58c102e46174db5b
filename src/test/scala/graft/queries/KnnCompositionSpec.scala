package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins v2c (trained-IVF-candidate kNN label transfer) against exact v2 —
  * the composition VERDICT r6 asked for, held to the AnnRecallSpec
  * discipline: label AGREEMENT is the metric (a label-transfer consumer
  * acts on pred_label, not on the neighbour list), floor = measured minus
  * margin. The full nprobe curve is printed so the recall/cost trade the
  * scaladoc documents stays measured, not asserted.
  */
class KnnCompositionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def preds(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.select("query_id", "pred_label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("v2c label agreement with exact v2 at sf0.01 stays above 0.75 (default nprobe)") {
    val exact = preds(V2KnnLabel.run(spark, TestSpark.sf001))
    assert(exact.nonEmpty, "no probes — the fixture is vacuous")
    // The recall/cost curve (measured when the default was chosen:
    // 0.70/0.75/0.85/0.90 at nprobe 6/8/10/12, 1.0 at 16 = exhaustive).
    val curve = Seq(6, 10, 16).map { np =>
      val c = preds(V2cKnnLabelIvf.run(spark, TestSpark.sf001, np))
      assert(c.keySet == exact.keySet,
        s"v2c(nprobe=$np) must answer every probe exact v2 answers")
      val a = exact.count { case (q, l) => c(q) == l }.toDouble / exact.size
      info(f"v2c label agreement at nprobe=$np: $a%.3f")
      np -> a
    }.toMap
    assert(curve(16) == 1.0,
      "probing every list is exhaustive kNN over the base — agreement must be exact")
    assert(curve(6) <= curve(10),
      "agreement should not decrease with wider probing on this fixture")
    val default = preds(V2cKnnLabelIvf.run(spark, TestSpark.sf001))
    val agreement = exact.count { case (q, l) => default(q) == l }.toDouble / exact.size
    info(f"v2c label agreement at default nprobe ${V2cKnnLabelIvf.defaultNProbe}: $agreement%.3f")
    assert(agreement >= 0.75, f"v2c agreement $agreement%.3f below the 0.75 floor")
  }
}
