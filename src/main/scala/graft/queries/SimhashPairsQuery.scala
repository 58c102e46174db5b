package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** d6: simhash near-dup pairs — band the 32-bit signature into 4 byte-keys
  * (pigeonhole: hamming ≤ 3 ⟹ at least one byte equal), join on band
  * equality, then exact hamming via bit_count(xor) ≤ 3.
  *
  * The classic simhash-at-scale shape (the pigeonhole banding is how
  * web-scale simhash dedup avoids n²); both engines' bit_count/xor agree on
  * int64, so the oracle reproduces it exactly. Composed entirely from
  * built-in codegen'd expressions — no custom Expression needed.
  */
object D6SimhashPairs extends GraftQuery {
  val name = "d6_simhash_pairs"
  val describe = "simhash hamming<=3 pairs via 4-byte pigeonhole banding + bit_count verify"

  private val maxHamming = 3
  private val nBands = 4 // 8 bits each over the 32-bit signature

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val sig = D3SimHash.run(spark, sfDir)
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(255).as("key"))
    }
    val bands = graft.CacheScope.persisted(sig
      .select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key")))
    bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  val oracle = {
    val inner = D3SimHash.oracle.get
    val bandSelects = (0 until nBands)
      .map(b => s"SELECT doc_id, simhash, $b AS band, (simhash >> ${b * 8}) & 255 AS key FROM sig")
      .mkString("\n  UNION ALL ")
    Some(
      s"""WITH sig AS ($inner),
         |bands AS (
         |  $bandSelects
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $maxHamming""".stripMargin)
  }
}
