package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC apply — the online half of q25's batch snapshot merge
  * ([[graft.operators.SnapshotMerge]]): a keyed update stream applied
  * against a BOOTSTRAPPED base snapshot, maintaining the latest value per
  * key. A nightly batch MERGE and a live CDC tail are the same operator at
  * two cadences; this is the live form, and UpsertStreamSpec pins that
  * replaying a delta batch through it lands on exactly the batch merge's
  * final state.
  *
  * Semantics: per key, the highest `seq` wins (ties to the larger value
  * arriving later are impossible by contract — `seq` is the CDC log
  * offset, unique per key), so out-of-order delivery within and across
  * micro-batches converges to the same state a sorted replay would.
  * Emits the key's latest (seq, value, disposition) whenever a batch's
  * UPDATES touched it (the bootstrap invocation of untouched base keys
  * emits nothing); disposition is `inserted` for a key absent from the
  * base snapshot, `updated` otherwise — q25's closed set minus `carried`,
  * which by definition never appears on a change stream.
  *
  * Scale: one `GroupState[(Long, Double, Boolean)]` (12 bytes + tag) per
  * DISTINCT KEY EVER UPDATED — not per event — in the state store;
  * bootstrap rides Spark's initial-state mechanism (the base snapshot is
  * read once, hash-partitioned like the stream, never broadcast). No
  * watermark: an upsert stream has no notion of lateness, only ordering,
  * which `seq` carries.
  */
object UpsertStream {
  final case class Upsert(key: Long, seq: Long, value: Double)
  /** (seq, value, wasInBase) */
  type KeyState = (Long, Double, Boolean)
  final case class Latest(key: Long, seq: Long, value: Double, disposition: String)

  def upsertLatest(
      updates: Dataset[Upsert],
      base: Dataset[(Long, KeyState)]): Dataset[Latest] = {
    import updates.sparkSession.implicits._
    val initial = base.groupByKey(_._1).mapValues(_._2)
    updates
      .groupByKey(_.key)
      .flatMapGroupsWithState[KeyState, Latest](
        OutputMode.Update, GroupStateTimeout.NoTimeout, initial) {
        (key: Long, it: Iterator[Upsert], state: GroupState[KeyState]) =>
          // The initial-state mechanism invokes every bootstrapped key once
          // in the first batch with an EMPTY iterator — a carried key is
          // not a change, so emit nothing (the reason this is flatMap, not
          // map: mapGroupsWithState would be forced to flood the output
          // with the whole base snapshot).
          if (it.isEmpty) Iterator.empty
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
}
