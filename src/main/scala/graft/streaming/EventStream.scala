package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming operators over the events stream — the engine's
  * streaming surface (the reference has none: its "iterations" re-scan a
  * static cache, SURVEY §2.E; this is new capability, not a port).
  *
  * Both operators have oracle-verified batch twins (w1_window_agg,
  * w2_sessions) computing identical results on the same data — the
  * equivalence is asserted in EventStreamSpec, which is how the streaming
  * path inherits the DuckDB correctness gate.
  *
  * Scale: windowed aggregation state is bounded by the watermark horizon ×
  * group cardinality; session state is one small record per active user,
  * hash-partitioned by user_id across executors. Both checkpoint
  * incrementally via the streaming state store.
  */
object EventStream {

  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class SessionState(lastSec: Long, nSessions: Long, nEvents: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Tumbling-window counts/sums with a watermark bounding state retention.
    * Output schema matches the batch twin w1 (epoch-second window start).
    */
  def windowedAgg(
      events: DataFrame,
      width: String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("w_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact deduplication: emit each key's FIRST occurrence only,
    * with state bounded by the watermark horizon (late duplicates beyond the
    * watermark are dropped by definition). The streaming twin of the batch
    * exact-dedup (d1): same key semantics, incremental state instead of a
    * global groupBy — this is how the dedup pipeline runs over a live
    * ingestion feed instead of a static corpus.
    */
  def dedupStream(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  /** Streaming NEAR-dedup: drop any document whose full minhash signature
    * tuple was already seen (watermarked state). Signature-tuple equality is
    * the highest-precision LSH criterion (all bands must collide) — suited
    * to a streaming admission filter where false drops are costly; batch
    * jobs (d2/d4) do the recall-oriented banded candidate generation.
    */
  def nearDedupStream(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      nHashes: Int = 8,
      watermark: String = "30 minutes"): DataFrame = {
    val toks = graft.operators.TextOps.tokens(col(textCol))
    val params = graft.operators.TextOps.minhashParams(nHashes)
    val p = graft.operators.TextOps.MinhashPrime
    // Hashed-shingle base (one md5 per TOKEN, arithmetic shingle hashes —
    // same pipeline as batch d2/d4; shingleHashes binds its argument once,
    // so the token-hash transform is evaluated once per row).
    val base = transform(
      array_distinct(graft.operators.TextOps.shingleHashes(
        graft.operators.TextOps.tokenHashes(toks), 3)),
      sh => sh % p)
    // All k minhashes in ONE fold so the base array is evaluated once per
    // row (k separate array_min(transform(base,...)) expressions would each
    // re-evaluate it — the HOF trap from TextOps.shingles), and deduplicated
    // as ONE array-typed key column.
    val folded = aggregate(
      base,
      array_repeat(lit(p), nHashes),
      (acc, x) => array(params.zipWithIndex.map { case ((a, b), i) =>
        least(element_at(acc, i + 1), (x * a + b) % p)
      }: _*))
    // Docs with <3 tokens have NO shingles; the fold would leave the
    // sentinel accumulator [p,...,p] — making every distinct short doc a
    // "duplicate" of the first one. Fall back to an exact content hash for
    // those (1-element array, can never collide with an 8-element
    // signature).
    val sig = when(size(base) > 0, folded)
      .otherwise(array(graft.functions.Portable.hash60(col(textCol))))
    docs
      .withColumn("__sig", sig)
      .withWatermark(tsCol, watermark)
      .dropDuplicates("__sig")
      .drop("__sig")
  }

  /** Streaming quality gate: t8's repetition filters (dup-word fraction +
    * top-bigram share) as a pure per-row projection — STATELESS, so it
    * applies to an unbounded document stream with no watermark, no state
    * store, and no shuffle; the natural first stage of a streaming
    * ingestion pipeline (cheap gate before any stateful dedup).
    *
    * The batch t8 computes the bigram mode with explode + grouped counts
    * (the right engine for a bounded corpus); a stream can't shuffle a
    * whole corpus per row, so here the mode folds over the row's own sorted
    * bigram array (longest equal run of sort_array(bgs) — O(n log n) per
    * document). StreamingQualityGateSpec asserts the two forms agree
    * column-for-column on the same data, which is how this path inherits
    * t8's DuckDB gate.
    *
    * HOF hygiene: tokens and bigrams are bound once per row through nested
    * single-element struct arrays (the TextOps.shingleHashes pattern) — the
    * run-length fold and both fractions read bound variables, so the
    * tokenizer and shingler run once per document no matter how the
    * optimizer collapses projections.
    */
  def qualityGate(
      docs: DataFrame,
      textCol: String = "text",
      dupWordMax: Double = graft.queries.T8Repetition.dupWordMax,
      topBigramMax: Double = graft.queries.T8Repetition.topBigramMax): DataFrame = {
    import graft.operators.TextOps
    def statsOf(t: org.apache.spark.sql.Column) = {
      def inner(q: org.apache.spark.sql.Column) = {
        val toks = q.getField("t")
        val bgs = q.getField("b")
        val n = size(toks)
        val acc0 = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
        def bump(a: org.apache.spark.sql.Column, x: org.apache.spark.sql.Column) =
          when(x === a.getField("prev"), a.getField("run") + 1).otherwise(lit(1L))
        val modeCnt = aggregate(sort_array(bgs), acc0,
          (a, x) => struct(x.as("prev"), bump(a, x).as("run"),
            greatest(a.getField("best"), bump(a, x)).as("best")),
          a => a.getField("best"))
        struct(
          n.as("n_tok"),
          when(n > 0, lit(1.0) - size(array_distinct(toks)).cast("double") / n)
            .otherwise(0.0).as("dup_word_frac"),
          when(size(bgs) > 0, modeCnt.cast("double") / size(bgs))
            .otherwise(0.0).as("top_bigram_frac"))
      }
      // Two nested one-element binds: tokens once, then bigrams once.
      flatten(transform(array(struct(t.as("t"))), p =>
        transform(array(struct(p.getField("t").as("t"),
          TextOps.shingles(p.getField("t"), 2).as("b"))), q => inner(q))))
    }
    docs
      .withColumn("__st", element_at(statsOf(TextOps.tokens(col(textCol))), 1))
      .withColumn("n_tok", col("__st.n_tok"))
      .withColumn("dup_word_frac", round(col("__st.dup_word_frac"), 6))
      .withColumn("top_bigram_frac", round(col("__st.top_bigram_frac"), 6))
      .withColumn("flagged",
        col("__st.dup_word_frac") > dupWordMax || col("__st.top_bigram_frac") > topBigramMax)
      .drop("__st")
  }

  /** The train-offline/serve-online half of k4: score a document stream
    * under FIXED trained classifier weights (k4's batch loop produces `w`;
    * this applies `round(sigmoid(w·f(text)), 6)` per arriving row). The
    * feature expressions are k4's OWN ([[graft.queries.K4QualityClassifier
    * .scoreCol]] — one definition, two surfaces), so the serving gate can
    * never drift from the training features — the skew every production
    * feature-store exists to prevent, here eliminated structurally.
    * Stateless like [[qualityGate]]: no watermark, no state store; batch
    * parity is exact because the expression tree is identical
    * (ClassifierGateStreamSpec replays a batch frame through the stream).
    */
  def classifierGate(
      docs: DataFrame,
      weights: Seq[Double],
      textCol: String = "text",
      keepAbove: Double = 0.5): DataFrame = {
    val score = graft.queries.K4QualityClassifier.scoreCol(weights, col(textCol))
    docs
      .withColumn("score", score)
      .withColumn("pred_ref", col("score") >= keepAbove)
  }

  /** Streaming PII gate: p8's redaction applied at ingestion time — each
    * arriving document leaves with its emails/phones/IPv4s replaced by
    * typed placeholders plus the per-type counts t20 reports, so PII never
    * reaches any downstream stateful stage (the redact-at-the-edge rule of
    * production anonymization). The pattern constants and the replacement
    * chain are [[graft.queries.PiiOps]]'s OWN — one definition, two
    * surfaces, same structural no-skew guarantee as [[classifierGate]].
    * Stateless: pure per-row projection, no watermark, no state store, no
    * shuffle; batch parity is exact because the expression tree is
    * identical (PiiGateStreamSpec replays micro-batches against p8's
    * expressions).
    */
  def piiGate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.queries.PiiOps._
    val t = col(textCol)
    docs
      .withColumn("n_emails", size(regexp_extract_all(t, lit(emailRe), lit(0))))
      .withColumn("n_phones", size(regexp_extract_all(t, lit(phoneRe), lit(0))))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(ipRe), lit(0))))
      .withColumn("redacted", redactCol(t))
  }

  /** Streaming corpus-drift COUNTS — t23's count stage as a live monitor:
    * per-token counts per slice maintained by stateful grouped aggregation
    * (the t15 count-min discipline: the aggregation state IS the merge, so
    * arbitrary micro-batch splits land on the same counts a batch pass
    * computes). State is VOCABULARY-bounded — one (token, two longs) row
    * per distinct token ever seen, not per event — which is exactly the
    * memory bound the batch t23 aggregate carries per partition. The JS
    * divergence itself is a cheap vocabulary-sized computation run on each
    * snapshot of these counts (a monitoring job reads the complete-mode
    * sink on its alert cadence); keeping it OUT of the stream keeps the
    * stateful operator single-purpose. DriftStreamSpec pins count parity
    * with batch t23 and that the JS computed from the streamed counts
    * equals t23's published js_e9.
    */
  def driftCounts(
      docs: DataFrame,
      grpCol: String = "grp",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(grpCol).as("grp"),
        explode(graft.operators.TextOps.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cnt_b"))

  /** Split routing gate — p13's train/val/test verdict stamped on each
    * document AT INGESTION (the point of a hash-threshold split: the
    * verdict is a pure function of doc_id, so the edge can route without
    * any state, coordination, or knowledge of the rest of the corpus —
    * rank-based sampling could never run here, since a rank needs the
    * population). Reads [[graft.queries.P13SplitManifest.splitCol]]
    * itself, so batch assignment and streamed routing structurally cannot
    * disagree; a val-routed doc stays val forever regardless of arrival
    * order or batch boundaries. Per-row projection: no shuffle, no state,
    * no watermark. SplitGateStreamSpec pins batch parity and
    * arrival-order invariance.
    */
  def splitGate(docs: DataFrame, docIdCol: String = "doc_id"): DataFrame =
    docs.withColumn("split",
      graft.queries.P13SplitManifest.splitCol(col(docIdCol)))

  /** k7's serve-online half: stamp each arriving document with its k4
    * classifier score (FIXED trained weights, [[classifierGate]]'s
    * contract) and its uncertainty distance to the PUBLISHED operating
    * threshold — the argmax-F1 row a batch k5 run produced, passed in the
    * way trained weights are. The annotation-queue SELECTION (top-n
    * nearest) is population-shaped and stays batch/monitor-side (a job
    * reads the stamped sink and TakeOrdereds on `uncert_e6`); the gate's
    * job is the per-row key, computed by k7's OWN expression
    * ([[graft.queries.K7UncertaintySample.uncertCol]]) so the served key
    * structurally cannot drift from the published queue's. Stateless: pure
    * projection, no watermark, no state store, no shuffle;
    * UncertaintyGateStreamSpec pins batch parity under shuffled arrival.
    */
  def uncertaintyGate(
      docs: DataFrame,
      weights: Seq[Double],
      threshold: Double,
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("score",
        graft.queries.K4QualityClassifier.scoreCol(weights, col(textCol)))
      .withColumn("thr", lit(threshold))
      .withColumn("uncert_e6",
        graft.queries.K7UncertaintySample.uncertCol(col("score"), col("thr")))

  /** s12's serve-online half: stamp each arriving document with its k4
    * score and its Efraimidis-Spirakis sampling key — u the exact 2^-20
    * hash rational of doc_id, −ln(u) snapped to the 1e6 grid BEFORE the
    * weight division, both by s12's OWN expressions
    * ([[graft.queries.S12PropensitySample.negLnUE6]]/keyE6), so the
    * streamed key is bit-identical to the batch sample's. The top-n draw
    * itself needs the population and stays batch/monitor-side; because the
    * key is a pure per-doc function, a monitor selecting the n smallest
    * keys over ANY prefix of the stream gets exactly the batch sample of
    * that prefix — A-ES's reservoir property, which is why this gate
    * composes with bounded-state reservoir selection at the edge.
    * Stateless: pure projection, no watermark, no state store, no shuffle;
    * PropensityGateStreamSpec pins batch parity under shuffled arrival.
    */
  def propensityGate(
      docs: DataFrame,
      weights: Seq[Double],
      textCol: String = "text",
      docIdCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("score",
        graft.queries.K4QualityClassifier.scoreCol(weights, col(textCol)))
      .withColumn("neg_ln_u_e6",
        graft.queries.S12PropensitySample.negLnUE6(col(docIdCol)))
      .withColumn("key_e6",
        graft.queries.S12PropensitySample.keyE6(col("neg_ln_u_e6"), col("score")))

  /** Streaming HyperLogLog registers — t24's register stage over a live
    * document stream, and the strongest form of the streamed-sketch
    * argument yet: where driftCounts' state is vocabulary-bounded and the
    * streamed count-min is cell-bounded, this state is FIXED-width — at
    * most 512 (register, max-rank) rows per source forever, no matter how
    * many tokens the stream ever carries — because the stateful grouped
    * max IS the HLL merge. The code is literally batch t24's `registers`
    * run on the unbounded frame (the mediaGate discipline: needing no new
    * operator is the point); a monitoring job reads the complete-mode sink
    * and runs `T24HllCardinality.estimate` over the snapshot on its alert
    * cadence, keeping the float-bearing estimate out of the stateful
    * stream. HllStreamSpec pins streamed registers == batch registers and
    * estimate-from-streamed == batch t24's row under arbitrary
    * micro-batch splits.
    */
  def hllRegisters(docs: DataFrame): DataFrame =
    graft.queries.T24HllCardinality.registers(docs)

  /** Streaming histogram bins — t25's bin stage over a live price stream,
    * completing the sketch trilogy's streaming story (t15 count-min cells,
    * t24 HLL registers, t25 histogram bins): the histogram's merge is
    * element-wise ADDITION, which is exactly what stateful grouped
    * counting does, so arbitrary micro-batch splits land on the same
    * (group, bin, c) table a batch pass computes. State is O(bins) per
    * group — bounded by the VALUE RANGE (~820 bins over lineitem's price
    * domain), not by row count. The quantile read-out stays OUT of the
    * stream (the hllRegisters discipline): a monitoring job runs
    * [[graft.queries.T25HistogramQuantiles.quantiles]] over the
    * complete-mode snapshot on its alert cadence, and because the bins are
    * exact integers the streamed quantiles are bit-equal to batch t25's,
    * not approximately so. HistogramStreamSpec pins both.
    */
  def histogramBins(rows: DataFrame): DataFrame =
    graft.queries.T25HistogramQuantiles.histogram(rows)

  /** Streaming daily volume — w11's count stage as a live monitor: per
    * (event_type, day) counts maintained by stateful grouped counting
    * (count merge = addition, the histogramBins argument), so arbitrary
    * micro-batch splits land on the same (type, day, cnt) table a batch
    * pass computes. State is O(types × days) — calendar-bounded, not
    * event-bounded. The z-score read-out stays OUT of the stream (the
    * hllRegisters discipline): a monitoring job runs
    * [[graft.queries.W11VolumeAnomaly.zScores]] over the complete-mode
    * snapshot on its alert cadence, and because the counts are exact
    * integers the streamed z table is bit-equal to batch w11's.
    * VolumeStreamSpec pins both.
    */
  def dailyVolume(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame =
    events
      .withColumn("day",
        (floor(unix_timestamp(col(tsCol)) / 86400L) * 86400L).cast("long"))
      .groupBy(col(typeCol).as("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))

  /** Markup-extraction gate — t21's strip chain applied at ingestion: the
    * HTML-boilerplate removal that runs ahead of even langid in a
    * web-corpus pipeline, as the stateless streaming stage it is in
    * production (crawl frames arrive, text leaves). Reads
    * [[graft.queries.T21MarkupStrip]]'s OWN pattern set and stripCol, so
    * batch strip and this gate structurally cannot disagree about what
    * markup is (the piiGate discipline); MarkupGateStreamSpec pins
    * byte-for-byte batch parity across micro-batches. Per-row projection:
    * no shuffle, no state, no watermark — partitioning follows the source.
    */
  def markupGate(docs: DataFrame, htmlCol: String = "html"): DataFrame = {
    import graft.queries.T21MarkupStrip
    val h = col(htmlCol)
    docs
      .withColumn("n_scripts",
        size(regexp_extract_all(h, lit(T21MarkupStrip.scriptRe), lit(0))))
      .withColumn("n_tags",
        size(regexp_extract_all(
          regexp_replace(h, T21MarkupStrip.scriptRe, " "),
          lit(T21MarkupStrip.tagRe), lit(0))))
      .withColumn("clean_text", T21MarkupStrip.stripCol(h))
  }

  /** Winnowing-fingerprint gate — t29's per-document fingerprint profile
    * stamped at ingestion (the markupGate discipline for the dedup front):
    * each arriving document leaves with its gram count, full-window count,
    * distinct winnowed-fingerprint count, order-independent fp digest, and
    * selection density — the profile d20's pair join and t29's monitoring
    * read, computed where the document first exists.
    *
    * Statelessness is structural: winnowing is a PER-DOCUMENT computation
    * (the window slides over one doc's gram sequence, never across docs),
    * so what batch t29 does with a doc_id-partitioned SQL window this gate
    * does with array combinators INSIDE the row — `slice`+`array_min` per
    * window position, `array_distinct` for the set, an `aggregate` XOR for
    * the digest. No shuffle, no state, no watermark; partitioning follows
    * the source. Hash/tokenizer/k/w all come from [[graft.queries.Winnowing]]
    * and [[graft.operators.TextOps]], so gate and batch cannot disagree
    * about what a fingerprint is; WinnowGateStreamSpec pins bit-exact
    * parity with t29 across micro-batches.
    *
    * Too-short documents (< w+k−1 tokens = no full window) are STAMPED
    * (null profile) rather than dropped — an ingestion gate must not lose
    * rows; t29 simply has no row for them (its minima frame is empty).
    */
  def winnowGate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.operators.TextOps
    import graft.queries.Winnowing
    val w = Winnowing.w
    val gh = TextOps.gramHashes(
      TextOps.tokenHashes(TextOps.tokens(col(textCol))), Winnowing.k)
    // One pass over the gram array per row: minima of each w-wide window,
    // then set-level profile columns. Round 16: the window minima go
    // through the native monotonic-deque WindowMin expression (O(grams)
    // inside codegen, replacing the per-window array_min(slice(...))
    // combinators — the same swap as the batch Winnowing.minimaOn;
    // WindowMinSpec pins bit-equality, WinnowGateStreamSpec re-pins t29
    // parity end to end).
    val wmins = org.apache.spark.sql.graft.WindowMin.windowMinCol(col("__gh"), w)
    val fps = array_distinct(col("__wmins"))
    // Every profile column is guarded by the SAME `size(__gh) >= w`
    // predicate (round-15 ADVICE fix): the previous form stamped
    // n_windows/n_fp/density via size(null), which is null only under
    // non-legacy sizeOfNull semantics — with
    // spark.sql.legacy.sizeOfNull=true they silently became -1/-1/1.0.
    // The explicit guard makes the stamped-null contract config-independent.
    val full = size(col("__gh")) >= w
    docs
      .withColumn("__gh", gh)
      .withColumn("__wmins", when(full, wmins))
      .withColumn("n_grams", when(full, size(col("__gh")).cast("long")))
      .withColumn("n_windows", when(full, size(col("__wmins")).cast("long")))
      .withColumn("n_fp", when(full, size(fps).cast("long")))
      .withColumn("fp_digest",
        expr("aggregate(array_distinct(__wmins), 0L, (acc, x) -> acc ^ x)"))
      .withColumn("density",
        when(full, round(col("n_fp").cast("double") / col("n_windows"), 6)))
      .drop("__gh", "__wmins")
  }

  final case class OpenSession(startSec: Long, lastSec: Long, nEvents: Long)
  final case class OpenSessions(sessions: List[OpenSession])
  final case class FinalizedSession(
      user_id: Long, start_sec: Long, end_sec: Long, n_events: Long)

  /** Production sessionization: watermark + `flatMapGroupsWithState` with
    * EventTimeTimeout, emitting each session exactly once, FINALIZED — only
    * when the event-time watermark has passed its end + gap, so no
    * in-horizon event (however late) can still extend it.
    *
    * Out-of-order correctness: a user's state is the LIST of its open
    * sessions (not just the newest one), because a late in-watermark event
    * may open a session EARLIER than the current one, extend any of them, or
    * bridge two into one — the same merge semantics batch sessionization
    * gets for free from sorting. An event joins every open session within
    * `gapSec` of its span (merging them if it touches several) or opens its
    * own. Eager closure on gap is deliberately NOT done: until the watermark
    * passes, a late event could still bridge the gap.
    *
    * State per user is its open-session list — bounded by the number of
    * distinct sessions inside one watermark horizon (≥1-event sessions
    * separated by > gap), so state stays proportional to active users, not
    * history. Expired sessions are emitted and dropped either by the timeout
    * callback or, for groups that receive data, inline before processing.
    *
    * Contrast [[sessionCounts]]: that variant emits running per-user counts
    * (update mode) and trusts chronological batches; this one is the
    * append-mode pipeline stage a downstream consumer can treat as an
    * immutable fact stream.
    */
  def finalizedSessions(
      events: Dataset[Event],
      gapSec: Long = 1800L,
      watermark: String = "30 minutes"): Dataset[FinalizedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, FinalizedSession](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[OpenSessions]) =>
          val wmSec = state.getCurrentWatermarkMs() / 1000L
          def expired(s: OpenSession): Boolean = s.lastSec + gapSec <= wmSec
          def finalize(s: OpenSession) =
            FinalizedSession(uid, s.startSec, s.lastSec, s.nEvents)
          def arm(live: List[OpenSession]): Unit =
            if (live.nonEmpty) {
              state.update(OpenSessions(live))
              // Earliest horizon first; live sessions all have end+gap > wm,
              // so the timestamp is legal (must exceed the watermark).
              state.setTimeoutTimestamp((live.map(_.lastSec).min + gapSec) * 1000L)
            } else state.remove()

          if (state.hasTimedOut) {
            val (done, live) = state.get.sessions.partition(expired)
            arm(live)
            done.sortBy(_.startSec).iterator.map(finalize)
          } else {
            // Sessions already past the horizon cannot be extended by any
            // admissible event (all future events have ts > wm ≥ end+gap):
            // emit them now — data-carrying groups get no timeout callback.
            var (done, live) = state.getOption.map(_.sessions).getOrElse(Nil)
              .partition(expired)
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val sec = e.ts.getTime / 1000L
              val (touching, rest) = live.partition(s =>
                sec >= s.startSec - gapSec && sec <= s.lastSec + gapSec)
              val merged = touching.foldLeft(OpenSession(sec, sec, 1L)) { (m, s) =>
                OpenSession(math.min(m.startSec, s.startSec),
                  math.max(m.lastSec, s.lastSec), m.nEvents + s.nEvents)
              }
              live = merged :: rest
            }
            arm(live)
            done.sortBy(_.startSec).iterator.map(finalize)
          }
      }
  }

  /** Per-user sessionization with `mapGroupsWithState`: state is (last event
    * second, session count, event count); a gap > `gapSec` opens a new
    * session. Within one micro-batch events are sorted by event time; across
    * batches correctness relies on batches arriving in time order (see
    * [[finalizedSessions]] for the watermark + EventTimeTimeout variant that
    * emits each session exactly once).
    */
  def sessionCounts(events: Dataset[Event], gapSec: Long = 1800L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          it.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val sec = e.ts.getTime / 1000
            val newSession = st.lastSec == Long.MinValue || sec - st.lastSec > gapSec
            st = SessionState(sec,
              st.nSessions + (if (newSession) 1 else 0),
              st.nEvents + 1)
          }
          state.update(st)
          UserSessions(uid, st.nSessions, st.nEvents)
      }
  }

  final case class GapState(lastSec: Long)
  final case class UserGap(user_id: Long, gap_s: Long)

  /** Streaming inter-arrival gap extraction — w9's stateful twin. State is
    * ONE long per user (the last event's epoch second); each micro-batch
    * emits the gaps it completes, including the cross-batch gap from the
    * stored state to the batch's first event — the part a stateless window
    * could not see. Downstream bucketing/histogramming is stateless (w9's
    * integer CASE chain); StreamingGapSpec asserts the emitted gap multiset
    * reproduces the oracle-verified batch histogram under arbitrary
    * micro-batch splits.
    *
    * Scale: state is bounded by active-user cardinality (8 bytes each),
    * hash-partitioned by user_id; a production deployment would add a
    * timeout to retire idle users (finalizedSessions shows the pattern).
    *
    * ORDERING PRECONDITION: events are sorted within a micro-batch, but
    * batch-w9 parity requires a user's events to arrive in time order
    * ACROSS batches too (the usual property of a per-key-ordered log like a
    * user-keyed Kafka partition). An event older than the stored lastSec
    * would otherwise emit a NEGATIVE gap and regress the state watermark —
    * such stragglers are DROPPED (state never moves backwards) and counted
    * in executor logs, mirroring how the exact batch pass (w9 offline) is
    * the authority whenever the feed can violate the precondition. The
    * fully general alternative — buffering per-user events against an
    * event-time timeout before emitting (the finalizedSessions pattern) —
    * costs a watermark horizon of state per user; this operator deliberately
    * stays O(8 bytes)/user for ordered feeds.
    */
  def gapStream(events: Dataset[Event]): Dataset[UserGap] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[GapState, UserGap](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[GapState]) =>
          // Looked up inside the task (slf4j caches it): a captured logger
          // field would make the state closure unserializable.
          val log = org.slf4j.LoggerFactory.getLogger("graft.streaming.EventStream")
          // (ts, event_id) ordering — the batch twin's exact tie-break.
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption.map(_.lastSec).getOrElse(Long.MinValue)
          val gaps = Seq.newBuilder[UserGap]
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            if (last == Long.MinValue) last = sec
            else if (sec >= last) { gaps += UserGap(uid, sec - last); last = sec }
            else log.warn(s"gapStream: dropped out-of-order event for user $uid " +
              s"($sec < state $last) — cross-batch ordering precondition violated")
          }
          state.update(GapState(last))
          gaps.result().iterator
      }
  }

  /** Bit offsets of the three position slices within the 62-bit shingle
    * hash (double-hashing shortcut, same construction as d8's fingerprint
    * Bloom). With mBits ≤ 2^20 the three 20-bit windows at 0/20/40 are
    * independent slices of one strong hash.
    */
  private val BloomSliceOffsets = Seq(0, 20, 40)

  /** DISTRIBUTED shingle-Bloom build over a reference corpus: k=3 positions
    * per distinct 3-gram shingle hash, OR-folded into mBits/64 words
    * (partial `bit_or` on every partition, tiny final merge — the d8 build
    * shape at shingle granularity), collected to the driver as the "model":
    * mBits/64 longs, e.g. 2^20 bits = 16 K longs = 128 KB. Ship it to the
    * stream side via [[contaminationGate]].
    */
  def shingleBloomWords(refDocs: DataFrame, mBits: Int, n: Int = 3): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(mBits <= (1 << 20), s"slice offsets cover 20-bit positions, got mBits=$mBits")
    val pos = explode(array(BloomSliceOffsets.map(o =>
      shiftright(col("sh"), o).bitwiseAND(mBits - 1)): _*)).as("pos")
    val words = graft.operators.TextOps.shingleHashSets(refDocs, n)
      .select(explode(col("shs")).as("sh"))
      .distinct()
      .select(pos)
      .select(shiftright(col("pos"), 6).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").as("mask"))
      .groupBy(col("word")).agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** STATELESS streaming contamination gate — d9's train/eval
    * decontamination semantics at ingest time: for each streamed document,
    * the fraction of its distinct 3-gram shingles probing positive in a
    * Bloom filter built from the reference corpus ([[shingleBloomWords]]).
    *
    * Why Bloom instead of the batch join: a stream cannot shuffle against a
    * 100 TB reference per micro-batch, but it CAN carry a 128 KB bit array
    * to every task. The Bloom is one-sided: a reference shingle ALWAYS
    * probes positive, so the streamed fraction is an UPPER bound on d9's
    * exact overlap_frac and a contaminated document is NEVER missed (zero
    * false negatives); false positives inflate the fraction by ~FPR and are
    * re-checked by the exact batch d9 offline. No state store, no
    * watermark, no shuffle — a pure per-row projection, composable in front
    * of the stateful dedup stages.
    *
    * HOF hygiene: the shingle array is bound once through a single-element
    * struct array (the TextOps pattern) — `size` and the probe `filter`
    * both read the bound variable, so the tokenize+hash chain runs once per
    * document. The bit test shifts by a COLUMN amount via
    * `call_function("shiftleft", ...)` (the Scala functions API only takes
    * literal shift amounts).
    */
  def contaminationGate(
      docs: DataFrame,
      textCol: String,
      bloomWords: Array[Long],
      mBits: Int,
      threshold: Double = 0.5,
      n: Int = 3): DataFrame = {
    require(bloomWords.length.toLong * 64 == mBits,
      s"bloomWords has ${bloomWords.length} words; expected ${mBits / 64}")
    val words = typedLit(bloomWords.toSeq)
    val shsRaw = array_distinct(
      graft.operators.TextOps.shingleHashes(
        graft.operators.TextOps.tokenHashes(
          graft.operators.TextOps.tokens(col(textCol))), n))
    def probeHit(sh: org.apache.spark.sql.Column) =
      BloomSliceOffsets.map { o =>
        val pos = shiftright(sh, o).bitwiseAND(mBits - 1)
        val word = element_at(words, (shiftright(pos, 6) + 1).cast("int"))
        word.bitwiseAND(
          call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))) =!= 0
      }.reduce(_ && _)
    val bound = transform(
      array(struct(shsRaw.as("s"))),
      p => struct(
        size(p.getField("s")).as("n_shingles"),
        size(filter(p.getField("s"), probeHit(_))).as("n_hit")))
    docs
      .withColumn("__c", element_at(bound, 1))
      .withColumn("n_shingles", col("__c.n_shingles").cast("long"))
      .withColumn("overlap_frac_ub",
        when(col("n_shingles") > 0,
          col("__c.n_hit").cast("double") / col("n_shingles")))
      .withColumn("contaminated", col("overlap_frac_ub") >= threshold)
      .drop("__c")
  }

  /** CMS row addressing: 4 rows, each reading a different bit-slice of the
    * 62-bit gram hash (the BloomSliceOffsets trick — the hash is md5-derived,
    * so slices are independent enough, and NO extra hashing is paid per gram
    * per row). Max width 2^20 keeps the top slice inside the hash.
    */
  private val CmSliceOffsets = Seq(0, 14, 28, 42)
  private val CmDepth = CmSliceOffsets.size

  /** DISTRIBUTED gram-count count-min build over a reference corpus: every
    * k-gram occurrence increments one cell per CMS row; the groupBy is
    * partial-aggregated, so each partition contributes its own depth×width
    * sub-sketch and the shuffle merges them cell-wise (t15's argument —
    * ≤ depth·width rows per partition regardless of corpus size). Collected
    * to the driver as the "model": depth·width longs, e.g. width 2^16 =
    * 2 MB. Ship it to the stream side via [[noveltyGate]]. Gram hashing is
    * [[graft.operators.TextOps]]'s own chain at d18's k, so the model and
    * the batch hits chain cannot disagree about what a gram is.
    */
  def gramCountCells(refDocs: DataFrame, width: Int,
      k: Int = graft.queries.ExactSubstr.k): Array[Long] = {
    require(width >= 64 && (width & (width - 1)) == 0 && width <= (1 << 20),
      s"width must be a power of two in [64, 2^20], got $width")
    import graft.operators.TextOps
    val addr = explode(array(CmSliceOffsets.zipWithIndex.map { case (o, r) =>
      struct(lit(r).as("r"),
        shiftright(col("h"), o).bitwiseAND(width - 1).as("b"))
    }: _*)).as("rb")
    val cells = refDocs
      .select(TextOps.gramHashes(TextOps.tokenHashes(TextOps.tokens(col("text"))), k).as("gh"))
      .select(explode(col("gh")).as("h"))
      .select(addr)
      .select(col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("cnt"))
      .collect()
    val arr = new Array[Long](CmDepth * width)
    cells.foreach(r => arr(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    arr
  }

  /** STATELESS streaming novelty gate — t28's per-document gram-novelty
    * score at ingest time, against a frozen count-min model of the corpus
    * ([[gramCountCells]]): for each streamed document, the count of gram
    * positions whose CMS-estimated corpus occurrence is ≥ 2, and the
    * resulting novelty score on t28's exact 1e6 grid.
    *
    * Why CMS instead of the batch join: a stream cannot shuffle against the
    * corpus-wide gram occurrence frame per micro-batch (d18's `hits` is a
    * corpus join), but it CAN carry a 2 MB counter array to every task. The
    * CMS is one-sided the way the contamination Bloom is: estimates only
    * ever OVER-count, so a truly duplicated position ALWAYS gates as
    * duplicated — `n_dup_ub` is an upper bound on t28's `n_dup_grams`,
    * `novelty_lb_e6` a lower bound on `novelty_e6` (a boilerplate document
    * is never scored novel; false positives deflate novelty by ~the
    * collision rate and are re-checked by the exact batch t28 offline).
    * Frozen-model semantics: a NEW document's grams score against the
    * reference counts — its own occurrences are not in the model, exactly
    * like contaminationGate. No state store, no watermark, no shuffle — a
    * pure per-row projection; NoveltyGateStreamSpec pins one-sidedness at a
    * hostile width, near-parity at a sized width, and exact t28 grid parity
    * wherever the estimate agrees.
    *
    * HOF hygiene: the gram array binds once through a single-element struct
    * array (the contaminationGate pattern), so the tokenize+hash chain runs
    * once per document; the per-gram estimate is `least` over CmDepth
    * `element_at` lookups into the literal cell array — all codegen'd.
    */
  def noveltyGate(docs: DataFrame, textCol: String, cmCells: Array[Long],
      width: Int, k: Int = graft.queries.ExactSubstr.k): DataFrame = {
    require(cmCells.length == CmDepth * width,
      s"cmCells has ${cmCells.length} cells; expected ${CmDepth * width}")
    import graft.operators.TextOps
    val cellsCol = typedLit(cmCells.toSeq)
    def est(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      CmSliceOffsets.zipWithIndex.map { case (o, r) =>
        element_at(cellsCol,
          (lit(r.toLong * width) + shiftright(h, o).bitwiseAND(width - 1) + 1).cast("int"))
      }.reduce(least(_, _))
    val gh = TextOps.gramHashes(TextOps.tokenHashes(TextOps.tokens(col(textCol))), k)
    val bound = transform(
      array(struct(gh.as("g"))),
      p => struct(
        size(p.getField("g")).as("n"),
        size(filter(p.getField("g"), x => est(x) >= 2)).as("nd")))
    docs
      .withColumn("__n", element_at(bound, 1))
      .withColumn("n_grams", col("__n.n").cast("long"))
      .withColumn("n_dup_ub", col("__n.nd").cast("long"))
      .withColumn("novelty_lb_e6",
        when(col("n_grams") === 0L, 1000000L).otherwise(
          round((lit(1.0) - col("n_dup_ub").cast("double") / col("n_grams").cast("double")) * 1e6)
            .cast("long")))
      .drop("__n")
  }
}
