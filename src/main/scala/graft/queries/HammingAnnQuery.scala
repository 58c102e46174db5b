package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** s14: HAMMING-space ANN over simhash signatures — top-k most similar
  * documents per probe where similarity is bit-agreement of the d3
  * signature, the complement of the cosine family (s1–s13): cosine ANN
  * ranks by embedding geometry, Hamming ANN by lexical shingle overlap
  * (simhash's bit votes), and production retrieval stacks run both (a
  * simhash index answers "near-verbatim variants of this page" far cheaper
  * than an embedding index).
  *
  * Candidate generation is the d6 pigeonhole banding reused as an INDEX:
  * probes meet only documents sharing at least one of the 4 byte-bands of
  * their signature (hamming ≤ 3 guarantees a shared band — the recall
  * floor; more distant neighbours surface only through band luck, which is
  * exactly the LSH trade every rung of the s-family makes). Exact
  * bit_count(xor) re-ranks candidates, ties broken by doc_id — both
  * engines agree on int64 bit ops, so the oracle reproduces candidates AND
  * ranking exactly.
  *
  * 100-TB shape: one shared signature scan (d3_signatures stage), banding
  * is a 4× explode, candidates come from a (band, key)-keyed equi-join —
  * never all-pairs, probe side is a filtered slice of the same frame (not
  * a broadcast of the probe set). The 8-bit band key is the fan-out knob:
  * at web scale the same construction runs 16-bit keys over 64-bit
  * signatures (4×16), keeping per-key fan-out flat as the corpus grows.
  * Top-k is a per-probe window — bounded by that probe's candidate count.
  */
object S14AnnHamming extends GraftQuery {
  val name = "s14_ann_hamming"
  val describe = "Hamming ANN over simhash: banded candidates, exact bit_count(xor) top-10 per probe"

  private[queries] val topK = 10
  private val nBands = 4 // 8 bits each over the 32-bit signature
  /** Every 50th doc probes the index (the s-family's probe-slice pattern). */
  private val probeMod = 50

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = D3SimHash.run(spark, sfDir)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(255).as("key"))
    }
    val bands = graft.CacheScope.persisted(sig
      .select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key")))
    val probes = bands.filter(col("doc_id") % probeMod === 0)
    val cand = probes.alias("p")
      .join(bands.alias("c"),
        col("p.band") === col("c.band") && col("p.key") === col("c.key") &&
          col("p.doc_id") =!= col("c.doc_id"))
      .select(col("p.doc_id").as("probe_id"), col("c.doc_id").as("doc_id"),
        bit_count(col("p.simhash").bitwiseXOR(col("c.simhash"))).cast("long").as("hamming"))
      .distinct()
    val byDist = Window.partitionBy(col("probe_id"))
      .orderBy(col("hamming"), col("doc_id"))
    cand.withColumn("rank", row_number().over(byDist).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("doc_id"), col("hamming"))
  }

  val oracle = {
    val inner = D3SimHash.oracle.get
    val bandSelects = (0 until nBands)
      .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 8}) & 255 AS key FROM sig")
      .mkString("\n  UNION ALL ")
    Some(
      s"""WITH sig AS MATERIALIZED ($inner),
         |bands AS MATERIALIZED (
         |  $bandSelects
         |),
         |cand AS (
         |  SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS doc_id,
         |         CAST(bit_count(xor(p.simhash, c.simhash)) AS BIGINT) AS hamming
         |  FROM bands p JOIN bands c
         |    ON p.band = c.band AND p.key = c.key AND p.doc_id <> c.doc_id
         |  WHERE p.doc_id % $probeMod = 0),
         |ranked AS (
         |  SELECT probe_id, doc_id, hamming,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |                                 ORDER BY hamming, doc_id) AS BIGINT) AS rank
         |  FROM cand)
         |SELECT probe_id, rank, doc_id, hamming FROM ranked WHERE rank <= $topK""".stripMargin)
  }
}
