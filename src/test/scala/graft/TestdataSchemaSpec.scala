package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canary for driver-side testdata regeneration.
  *
  * Round 7's only regression mechanism was silent schema drift: the driver
  * regenerated events.parquet with ts as TIMESTAMP(MICROS) where the repo
  * expected raw INT64 nanos, and 11 queries crashed mid-gate with nothing in
  * the test suite pointing at the cause. This spec pins the *scanned* schema
  * of all ten tables (plus the normalized events contract) so the next
  * regeneration fails here first, with the drifted column named in the
  * message instead of surfacing as a pile of downstream query errors.
  *
  * The events `ts` pin intentionally accepts any of the three encodings
  * Tables.events knows how to normalize — the canary is for drift *outside*
  * the adaptive envelope, plus name/column-set drift anywhere.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // (table, column -> acceptable dataTypes). Timestamp columns list every
  // encoding the loaders tolerate; everything else is exact.
  private val expected: Seq[(String, Seq[(String, Seq[DataType])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Seq(IntegerType), "r_name" -> Seq(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> Seq(IntegerType), "n_name" -> Seq(StringType),
      "n_regionkey" -> Seq(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> Seq(LongType), "c_name" -> Seq(StringType),
      "c_nationkey" -> Seq(IntegerType), "c_acctbal" -> Seq(DoubleType),
      "c_mktsegment" -> Seq(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> Seq(LongType), "s_name" -> Seq(StringType),
      "s_nationkey" -> Seq(IntegerType), "s_acctbal" -> Seq(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> Seq(LongType), "p_name" -> Seq(StringType),
      "p_brand" -> Seq(StringType), "p_type" -> Seq(StringType),
      "p_size" -> Seq(IntegerType), "p_retailprice" -> Seq(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> Seq(LongType), "o_custkey" -> Seq(LongType),
      "o_orderstatus" -> Seq(StringType), "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> Seq(TimestampNTZType, TimestampType),
      "o_orderpriority" -> Seq(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> Seq(LongType), "l_partkey" -> Seq(LongType),
      "l_suppkey" -> Seq(LongType), "l_linenumber" -> Seq(IntegerType),
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_tax" -> Seq(DoubleType),
      "l_returnflag" -> Seq(StringType), "l_linestatus" -> Seq(StringType),
      "l_shipdate" -> Seq(TimestampNTZType, TimestampType)),
    "events" -> Seq(
      "event_id" -> Seq(LongType),
      // The three encodings Tables.events normalizes (nanos-as-long under
      // the legacy flag, TIMESTAMP_NTZ micros, adjusted TimestampType).
      "ts" -> Seq(LongType, TimestampNTZType, TimestampType),
      "user_id" -> Seq(LongType), "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType), "props" -> Seq(StringType)),
    "documents" -> Seq(
      "doc_id" -> Seq(LongType), "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType),
      "n_chars" -> Seq(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType, containsNull = true),
                         ArrayType(FloatType, containsNull = false)),
      "label" -> Seq(IntegerType)))

  for ((table, cols) <- expected) {
    test(s"testdata schema: $table") {
      val schema = Tables.load(spark, TestSpark.sf0001, table).schema
      val actualNames = schema.fields.map(_.name).toSeq
      val expectedNames = cols.map(_._1)
      assert(actualNames == expectedNames,
        s"$table column set drifted: driver now writes ${actualNames.mkString(", ")} " +
          s"(expected ${expectedNames.mkString(", ")})")
      for ((name, accepted) <- cols) {
        val actual = schema(name).dataType
        assert(accepted.contains(actual),
          s"$table.$name drifted to $actual (loaders accept: ${accepted.mkString(" | ")}) " +
            "— update Tables + dependent queries before trusting this round's gate")
      }
    }
  }

  test("Tables.events normalizes ts to TimestampType regardless of encoding") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    assert(ev.schema("ts").dataType == TimestampType,
      s"Tables.events must surface ts as TimestampType, got ${ev.schema("ts").dataType}")
    // And the values must be sane instants (the sf generator writes 2024+
    // data): a unit blunder (e.g. treating micros as nanos) lands decades off.
    val r = ev.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").collect()(0)
    assert(r.getInt(0) >= 2000 && r.getInt(1) <= 2100,
      s"events.ts normalization produced out-of-range years [${r.get(0)}, ${r.get(1)}]")
  }
}
