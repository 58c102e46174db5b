package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the online half of q25/q27's batch snapshot merge
  * ([[graft.operators.SnapshotMerge]]): a keyed change stream applied
  * against a BOOTSTRAPPED base snapshot, maintaining the latest value per
  * key. A nightly batch MERGE and a live CDC tail are the same operator at
  * two cadences; this is the live form, and UpsertStreamSpec pins that
  * replaying a delta batch through it lands on exactly the batch merge's
  * final state.
  *
  * Semantics: per key, the highest `seq` wins (`seq` is the CDC log
  * offset, unique per key), so out-of-order delivery within and across
  * micro-batches converges to the same state a sorted replay would.
  * Emits the key's latest (seq, value, disposition) whenever a batch's
  * events touched it (the bootstrap invocation of untouched base keys
  * emits nothing); disposition is `inserted` for a key absent from the
  * base snapshot (or re-appearing after a delete), `updated` for a present
  * key, `deleted` when the winner is a tombstone — q25's closed set minus
  * `carried`, which by definition never appears on a change stream, plus
  * q27's `deleted`.
  *
  * DELETES AND STATE REMOVAL: a winning tombstone ([[CdcEvent.deleted]])
  * emits `deleted` and flips the state to a TOMBSTONE entry with a
  * processing-time timer; when the timer fires the state is REMOVED — the
  * state store shrinks by the deleted key. The tombstone lingers for
  * `tombstoneGraceMs` first so a STALE (lower-seq) update arriving out of
  * order cannot resurrect the key; after eviction, a late event for the
  * key is indistinguishable from a fresh insert — the standard bounded
  * trade (Kafka compaction's delete.retention.ms is the same knob), and
  * both sides of it are pinned in UpsertStreamSpec.
  *
  * TIMER COST (why [[upsertLatest]] exists separately): any
  * `ProcessingTimeTimeout` stream self-triggers no-data micro-batches
  * continuously (`FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is
  * unconditionally true under processing-time timers) — in production set a
  * real trigger interval (e.g. `Trigger.ProcessingTime("30 seconds")`) so
  * the timer sweep runs at that cadence instead of spinning; in tests poll
  * the sink, because `processAllAvailable()` never returns on a
  * timer-bearing stream.
  *
  * Scale: one `GroupState[(Long, Double, Boolean, Boolean)]` (~13 bytes +
  * tag) per DISTINCT KEY EVER TOUCHED — not per event — and deleted keys
  * leave the store after the grace window, so a churning corpus's state is
  * bounded by its LIVE key count, not its all-time one. Bootstrap rides
  * Spark's initial-state mechanism (the base snapshot is read once,
  * hash-partitioned like the stream, never broadcast). No watermark: an
  * upsert stream has no notion of lateness, only ordering, which `seq`
  * carries; the only timer is the tombstone eviction clock.
  */
object UpsertStream {
  final case class Upsert(key: Long, seq: Long, value: Double)
  final case class CdcEvent(key: Long, seq: Long, value: Double, deleted: Boolean)
  /** (seq, value, wasInBase, isTombstone) */
  type KeyState = (Long, Double, Boolean, Boolean)
  final case class Latest(key: Long, seq: Long, value: Double, disposition: String)

  /** Update-only form (no tombstones). NOT a delegation to [[applyCdc]],
    * deliberately: a timer-free stream must stay on
    * `GroupStateTimeout.NoTimeout` — with `ProcessingTimeTimeout`, Spark's
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is unconditionally
    * true, so the query self-triggers EMPTY micro-batches back-to-back
    * forever (and `processAllAvailable()` never returns, since `noNewData`
    * is never set). A stream that cannot carry deletes should not pay the
    * timer machinery's busy-trigger cost.
    */
  def upsertLatest(
      updates: Dataset[Upsert],
      base: Dataset[(Long, (Long, Double, Boolean))]): Dataset[Latest] = {
    import updates.sparkSession.implicits._
    val initial = base.groupByKey(_._1).mapValues(_._2)
    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Double, Boolean), Latest](
        OutputMode.Update, GroupStateTimeout.NoTimeout, initial) {
        (key: Long, it: Iterator[Upsert], state: GroupState[(Long, Double, Boolean)]) =>
          if (it.isEmpty) Iterator.empty // bootstrap invocation: not a change
          else {
            val prior = state.getOption
            val best = it.foldLeft(prior) {
              case (acc, u) if acc.forall(_._1 < u.seq) =>
                Some((u.seq, u.value, acc.exists(_._3)))
              case (acc, _) => acc
            }
            val (seq, value, wasInBase) = best.get
            state.update((seq, value, wasInBase))
            Iterator.single(
              Latest(key, seq, value, if (wasInBase) "updated" else "inserted"))
          }
      }
  }

  def applyCdc(
      events: Dataset[CdcEvent],
      base: Dataset[(Long, KeyState)],
      tombstoneGraceMs: Long = 10L * 60 * 1000): Dataset[Latest] = {
    import events.sparkSession.implicits._
    val initial = base.groupByKey(_._1).mapValues(_._2)
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, Latest](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout, initial) {
        (key: Long, it: Iterator[CdcEvent], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            // tombstone grace expired: the key leaves the state store
            state.remove()
            Iterator.empty
          } else if (it.isEmpty) {
            // The initial-state mechanism invokes every bootstrapped key once
            // in the first batch with an EMPTY iterator — a carried key is
            // not a change, so emit nothing (the reason this is flatMap, not
            // map: mapGroupsWithState would be forced to flood the output
            // with the whole base snapshot).
            Iterator.empty
          } else {
            val prior = state.getOption
            // highest seq wins, across the prior state and this batch
            val best = it.foldLeft(prior.map(s => (s._1, s._2, s._4))) {
              case (acc, e) if acc.forall(_._1 < e.seq) =>
                Some((e.seq, e.value, e.deleted))
              case (acc, _) => acc
            }.get
            val (seq, value, dead) = best
            // wasInBase survives updates; a post-delete re-appearance is a
            // fresh insert (the base identity died with the tombstone)
            val wasLive = prior.exists(s => !s._4)
            val wasInBase = prior.exists(s => s._3 && !s._4)
            state.update((seq, value, wasInBase, dead))
            if (dead) {
              state.setTimeoutDuration(math.max(1L, tombstoneGraceMs))
              // emit only the live→dead transition: a tombstone for a key
              // never live is a no-op (mergeCdc's dropped branch — batch
              // parity), and a re-delivered delete for an already-dead key
              // is not a change
              if (wasLive) Iterator.single(Latest(key, seq, value, "deleted"))
              else Iterator.empty
            } else {
              Iterator.single(Latest(key, seq, value,
                if (wasLive) "updated" else "inserted"))
            }
          }
      }
  }
}
