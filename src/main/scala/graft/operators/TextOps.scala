package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Tokenization / shingling / minhash building blocks for the document
  * pipeline, as Column expressions with exact DuckDB SQL mirrors. Everything
  * here is executor-local array work (no UDFs, no shuffles) — the shuffles
  * happen only at the dedup joins that consume these columns.
  *
  * The reference has no text processing at all; this is the training-data
  * pipeline extension surface (builder brief), designed so each derived
  * column is recomputable on any executor from the row alone — the property
  * that lets dedup scale by pure hash-partitioning at 100 TB.
  */
object TextOps {

  /** Lowercased alphanumeric word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  def tokensSql(text: String): String =
    s"list_filter(string_split_regex(lower($text), '[^a-z0-9]+'), x -> x <> '')"

  /** Word n-gram shingles joined by single spaces; empty when the document
    * has fewer than n tokens (guarded — Spark's `sequence` would otherwise
    * produce a DESCENDING sequence for start > stop).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(toks: String, n: Int): String = {
    val parts = (0 until n).map(j => s"$toks[i + $j]").mkString(" || ' ' || ")
    s"list_transform(range(1, greatest(len($toks) - ${n - 2}, 1)), i -> $parts)"
  }

  /** Minhash value for one seeded hash over a shingle array (null when the
    * array is empty — callers filter those documents out on both sides).
    */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s => Portable.hash60(concat(lit(s"$seed:"), s))))

  def minhashSql(shingles: String, seed: Int): String =
    s"list_min(list_transform($shingles, s -> ${Portable.hash60Sql(s"'$seed:' || s")}))"
}
