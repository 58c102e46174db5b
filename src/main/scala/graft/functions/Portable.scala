package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable hashing built from md5 — the one hash both
  * Spark and the DuckDB oracle compute bit-identically on the same UTF-8
  * bytes. Murmur (`hash()`) differs between the engines, so every hash that
  * participates in an oracle-checked result goes through here.
  *
  * The reference's only hashing is Java `hashCode` inside its coordinator
  * maps; record-level hashing for dedup/fingerprinting is part of our
  * pipeline extension surface, so portability with the oracle is the design
  * constraint, not parity with guagua.
  */
object Portable {

  /** Lowercase hex md5 of a string column (DuckDB: `md5(x)`). */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** 60-bit non-negative hash: first 15 hex chars of md5, as a long.
    * DuckDB equivalent: `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
    *
    * Routed through the native [[org.apache.spark.sql.graft.Md5Hash60]]
    * expression since round 15: bit-identical values (the 15 hex chars ARE
    * the digest's top 60 bits), but computed straight from the digest —
    * no 32-char hex string, substring copy, or radix re-parse per call.
    * This is the hottest scalar in the engine (once per token in every
    * shingle/gram/winnow chain); Md5Hash60Spec pins equality against the
    * composed `conv(substring(md5(..),1,15),16,10)` form.
    */
  def hash60(c: Column): Column =
    org.apache.spark.sql.graft.Md5Hash60.hash60Col(c)

  /** The pre-round-15 composed-builtins form of [[hash60]] — kept as the
    * equality witness Md5Hash60Spec compares against.
    */
  private[graft] def hash60Composed(c: Column): Column =
    conv(substring(md5Hex(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded member of a 60-bit hash family (for minhash/LSH). */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** SQL text of [[hash60]] over an arbitrary SQL expression, for oracle
    * generation. Keep in lockstep with the Column version above.
    */
  def hash60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  def hash60Sql(expr: String, seed: Int): String =
    hash60Sql(s"'$seed:' || $expr")

  /** Whitespace-normalized lowercase content — the canonical pre-fingerprint
    * normalization shared by t4 (fingerprint column) and d8 (Bloom probe):
    * one definition, so the two can never drift apart. DuckDB regexp_replace
    * replaces only the first match unless the 'g' flag is passed; Spark
    * always replaces all — hence the explicit flag in the SQL mirror.
    */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  def normalizedTextSql(expr: String): String =
    s"trim(regexp_replace(lower($expr), '\\s+', ' ', 'g'))"
}
