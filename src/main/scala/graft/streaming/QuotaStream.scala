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
}
