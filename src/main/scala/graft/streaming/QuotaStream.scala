package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming mixture-quota admission — p3's streaming twin: documents
  * arrive as a stream and each source admits at most its quota, after
  * which the source's documents are dropped at ingest. This is how a
  * mixing budget is enforced when the corpus arrives incrementally (batch
  * p3 re-ranks a bounded corpus; a stream can't rank what hasn't arrived).
  *
  * Semantics: admission is first-arrival within the stream, so membership
  * differs from batch p3's hash-rank-first picks by design; the CONTRACT a
  * downstream mixing job needs — per-source admitted count == quota once
  * the stream has carried at least quota documents of that source — is
  * what QuotaStreamSpec pins against batch p3's output.
  *
  * Scale shape: state is ONE counter per source (`GroupState[Long]`,
  * bounded by the source vocabulary — hundreds, not documents), no
  * watermark and no timeout because quotas are corpus-lifetime; the
  * grouping shuffle is keyed on source, and a heavily-skewed source is
  * still one counter (the per-batch iterator is consumed lazily, admitting
  * then discarding). Exactly-once admission follows from the state store's
  * transactional batch semantics.
  */
object QuotaStream {

  final case class DocArrival(doc_id: Long, source: String)

  def quotaAdmission(
      docs: Dataset[DocArrival],
      quotas: Map[String, Long]): Dataset[DocArrival] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, DocArrival](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[DocArrival], state: GroupState[Long]) =>
          val quota = quotas.getOrElse(source, 0L)
          val admitted = state.getOption.getOrElse(0L)
          val room = math.min(math.max(quota - admitted, 0L), Int.MaxValue.toLong).toInt
          val out = batch.take(room).toList
          state.update(admitted + out.size)
          out.iterator
      }
  }

  /** A mid-stream quota revision: from the batch it arrives in onward,
    * `source` admits against `quota` instead of its previous value.
    */
  final case class QuotaCommand(source: String, quota: Long)

  /** Internal envelope for the doc/control union: one keyed stream so a
    * source's commands and arrivals meet in the SAME state partition (the
    * only place ordering between them is well defined).
    */
  final case class QuotaIn(doc_id: Long, source: String, newQuota: Long, isUpdate: Boolean)

  final case class RebalanceState(quota: Long, admitted: Long)

  /** REBALANCING quota admission — [[quotaAdmission]] with the quota map
    * made a live input: production mixing pipelines re-weight sources
    * mid-stream (a source turns out lower-quality than sampled, a new
    * contract changes its share), and a static map would need a query
    * restart + state migration. Here quota revisions are a SECOND stream of
    * [[QuotaCommand]]s, unioned with the arrivals and keyed by source, so a
    * source's control and data records flow through the same
    * `flatMapGroupsWithState` partition — Spark's idiomatic control-channel
    * pattern (a per-batch re-broadcast config frame cannot reach state that
    * lives inside the state store, and a broadcast variable cannot change
    * under a running query).
    *
    * Semantics (pinned in QuotaRebalanceSpec against a two-phase driver
    * replay): within a micro-batch, commands apply BEFORE arrivals (a batch
    * that carries its own re-weight admits under it — and the spec feeds
    * commands in their own batch anyway, where the order question vanishes);
    * RAISING a quota resumes admission from the stored counter; LOWERING it
    * never retro-drops (already-admitted docs are immutable downstream
    * facts — the stream can only stop admitting; `admitted` may exceed a
    * lowered quota and the overhang is the operator's report, not its
    * rollback). Sources with no command admit nothing until one arrives
    * (quota 0) unless seeded via `initialQuotas`.
    *
    * Scale shape: unchanged from [[quotaAdmission]] — one small state
    * record per source, shuffle keyed on source, no watermark/timeout; the
    * control stream is metadata-rate (human- or job-issued), so the union
    * adds no meaningful volume.
    */
  def rebalancingQuotaAdmission(
      docs: Dataset[DocArrival],
      commands: Dataset[QuotaCommand],
      initialQuotas: Map[String, Long] = Map.empty): Dataset[DocArrival] = {
    import docs.sparkSession.implicits._
    val env = docs.map(d => QuotaIn(d.doc_id, d.source, -1L, isUpdate = false))
      .unionByName(commands.map(c => QuotaIn(-1L, c.source, c.quota, isUpdate = true)))
    env.groupByKey(_.source)
      .flatMapGroupsWithState[RebalanceState, DocArrival](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[QuotaIn], state: GroupState[RebalanceState]) =>
          var st = state.getOption.getOrElse(
            RebalanceState(initialQuotas.getOrElse(source, 0L), 0L))
          val out = List.newBuilder[DocArrival]
          // Commands first: the last command in a batch wins (they are
          // metadata-rate; intra-batch command order is the issuer's
          // responsibility, exactly as with any config store).
          val (ups, arrivals) = batch.toList.partition(_.isUpdate)
          ups.foreach(u => st = st.copy(quota = u.newQuota))
          arrivals.foreach { a =>
            if (st.admitted < st.quota) {
              out += DocArrival(a.doc_id, a.source)
              st = st.copy(admitted = st.admitted + 1)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
