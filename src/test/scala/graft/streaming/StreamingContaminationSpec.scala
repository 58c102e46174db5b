package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming contamination gate vs its exact batch twin (d9) on the
  * same corpus slice. The gate's Bloom is one-sided, so two properties are
  * provable and pinned, not just measured:
  *
  *   1. NO FALSE NEGATIVES — per document, the streamed overlap fraction is
  *      ≥ d9's exact fraction, so every batch-contaminated document is
  *      stream-flagged;
  *   2. the inflation is bounded — flagged-but-clean documents are Bloom
  *      false positives at shingle level, pinned under a measured ceiling.
  *
  * Plus the scale property that justifies the design: the gate runs with
  * ZERO stateful operators (pure projection — no state store, no watermark).
  */
class StreamingContaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  case class Doc(doc_id: Long, ts: Timestamp, text: String)

  private val mBits = 1 << 17 // 2048 words; ~40k ref shingles at sf0.001

  test("stream gate is a superset of batch d9 (no false negatives), bounded inflation, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // Exact batch twin on the same slice.
    val batch = graft.queries.D9Contamination.run(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)), !r.isNullAt(4) && r.getBoolean(4)))
      .toMap
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    // Bloom model from the reference half (even ids) — the d9 split.
    val docsDf = graft.Tables.documents(spark, TestSpark.sf0001)
    val words = EventStream.shingleBloomWords(
      docsDf.filter($"doc_id" % 2 === 0), mBits)
    assert(words.count(_ != 0L) > 100, "bloom build produced a near-empty filter")

    // Stream the probe half (odd ids) through the gate.
    val t0 = 1700000000000L
    val probes = docsDf.filter($"doc_id" % 2 === 1)
      .select($"doc_id", $"text").collect()
      .map(r => Doc(r.getLong(0), new Timestamp(t0 + r.getLong(0)), r.getString(1)))
    val stream = MemoryStream[Doc]
    val gated = EventStream.contaminationGate(stream.toDF(), "text", words, mBits)
      .select($"doc_id", $"n_shingles", $"overlap_frac_ub", $"contaminated")
    val q = gated.writeStream.format("memory")
      .queryName("contam_out").outputMode("append").start()
    try {
      probes.grouped(120).foreach { chunk =>
        stream.addData(chunk.toSeq); q.processAllAvailable()
      }
      // Stateless: the streaming plan must carry no state store operators.
      assert(q.lastProgress.stateOperators.isEmpty,
        s"gate is not stateless: ${q.lastProgress.stateOperators.mkString(",")}")

      val out = spark.table("contam_out").collect().map { r =>
        r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          !r.isNullAt(3) && r.getBoolean(3))
      }.toMap
      assert(out.keySet == batch.keySet, "gate dropped or duplicated probe documents")

      var flagged = 0
      var batchContaminated = 0
      var falsePositives = 0
      out.foreach { case (id, (fracUb, flag)) =>
        val (exact, exactFlag) = batch(id)
        (fracUb, exact) match {
          case (Some(ub), Some(ex)) =>
            // d9's fraction is rounded to 6 decimals (may round UP by 5e-7);
            // the gate's is unrounded — compare with that margin.
            assert(ub >= ex - 5.1e-7,
              f"doc $id: streamed fraction $ub%.7f < exact $ex%.7f — Bloom lost a reference shingle")
          case (None, None) => // both unscorable (no shingles)
          case other => fail(s"doc $id: scorability disagrees: $other")
        }
        if (exactFlag) { batchContaminated += 1
          assert(flag, s"doc $id: batch-contaminated but not stream-flagged (false negative)")
        }
        if (flag) flagged += 1
        if (flag && !exactFlag) falsePositives += 1
      }
      assert(batchContaminated > 0, "fixture has no contaminated docs — superset test is vacuous")
      // Measured 0 extra flags at sf0.001 with m=2^17 (FPR ~0.1% per
      // shingle never moves a document across the 0.5 threshold here);
      // ceiling pinned loosely to absorb corpus regeneration.
      assert(falsePositives <= math.max(2, flagged / 5),
        s"$falsePositives false flags of $flagged — Bloom too small for the reference set")
    } finally q.stop()
  }
}
