package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic pins for w6's ordered-funnel rules on a crafted fixture: order
  * matters (a purchase before the first view must not convert) and the
  * attribution window matters (a click 10 h after the last view must not
  * qualify). The DuckDB gate proves Spark and the oracle agree; this spec
  * proves they agree on the RIGHT semantics.
  */
class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("funnel: ordering and the 6h attribution window decide the stage") {
    import spark.implicits._
    val H = 3600L * 1000000000L // one hour in nanos (events.ts is raw nanos)
    // (event_id, ts_nanos, user_id, event_type, value, props)
    val rows = Seq(
      // u1: clean conversion view -> click(+1h) -> purchase(+2h) = stage 3
      (1L, 0 * H, 1L, "view", 1.0, "{}"),
      (2L, 1 * H, 1L, "click", 1.0, "{}"),
      (3L, 2 * H, 1L, "purchase", 1.0, "{}"),
      // u2: same events REVERSED = stage 1 (order matters)
      (4L, 0 * H, 2L, "purchase", 1.0, "{}"),
      (5L, 1 * H, 2L, "click", 1.0, "{}"),
      (6L, 2 * H, 2L, "view", 1.0, "{}"),
      // u3: click 10h after the view = stage 1 (attribution window)
      (7L, 0 * H, 3L, "view", 1.0, "{}"),
      (8L, 10 * H, 3L, "click", 1.0, "{}"),
      // u4: qualifying click, purchase 19h later = stage 2
      (9L, 0 * H, 4L, "view", 1.0, "{}"),
      (10L, 1 * H, 4L, "click", 1.0, "{}"),
      (11L, 20 * H, 4L, "purchase", 1.0, "{}"),
      // u5: no view at all = stage 0
      (12L, 0 * H, 5L, "click", 1.0, "{}"),
      (13L, 1 * H, 5L, "purchase", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("funnel_fixture").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = W6Funnel.run(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 1 -> 2L, 2 -> 1L, 3 -> 1L),
      s"stage histogram $got diverged from the crafted expectation")
  }
}
