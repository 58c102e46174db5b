package graft.operators

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed Aggregator — the combiner-style alternative to a
  * rank window for "k best per group": a row_number window must SHUFFLE AND
  * SORT every scored row on the group key before it can rank (the full
  * probe×base pair stream, in v2's case), while an Aggregator carries at
  * most k entries per group through partial aggregation — each map task
  * emits ≤ k rows per group, the exchange moves |groups|·k·|partitions|
  * rows at worst, and the final merge is k-bounded. Same preference ladder
  * as the kernel's A5 eager combiner: fold early, ship the folded state.
  *
  * Ordering is (score DESC, id ASC) — the exact (cos desc, neighbor_id asc)
  * total order the window formulation used, so results are bit-identical
  * (pinned by TopKSpec against the window path). Selection under a total
  * order is associative and commutative, so merge order cannot matter.
  *
  * Entries are (score, id, payload); payload rides along uninterpreted
  * (v2 carries the neighbour's label to the vote stage).
  */
object TopK {
  type Entry = (Double, Long, Int) // (score, id, payload)

  /** Insert keeping `xs` sorted by (score desc, id asc), capped at k. */
  private def insert(xs: List[Entry], e: Entry, k: Int): List[Entry] = {
    val (before, after) = xs.span(x => x._1 > e._1 || (x._1 == e._1 && x._2 < e._2))
    val merged = before ::: e :: after
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  private def mergeLists(a: List[Entry], b: List[Entry], k: Int): List[Entry] =
    b.foldLeft(a)((acc, e) => insert(acc, e, k))

  /** True iff `e` sorts strictly after every entry of a FULL buffer whose
    * worst (= last) entry is `last` — the no-allocation reject path. With a
    * selective group (v2: k=10 survivors out of ~57k candidates per probe),
    * ~99.98% of reduce calls take this branch; without it every rejected row
    * still paid ~2k cons-cell allocations in [[insert]] (span + concat +
    * take), which across v2's ~140M-pair stream was a multi-gigaallocation
    * GC load that dominated the query's wall-clock (measured: the reject
    * path took v2 from 4.6 s to ~3 s class at sf0.1).
    */
  @inline private def sortsAfterLast(last: Entry, e: Entry): Boolean =
    last._1 > e._1 || (last._1 == e._1 && last._2 < e._2)

  def topK(k: Int): TypedColumn[Entry, Seq[Entry]] = {
    // The reduce fast path dereferences the buffer's last entry once
    // size >= k; with k <= 0 that reads null off an empty buffer. No
    // meaningful top-0 exists, so reject at construction.
    require(k > 0, s"topK requires k > 0, got $k")
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      def zero: List[Entry] = Nil
      def reduce(b: List[Entry], a: Entry): List[Entry] = {
        // Walk to the last node once (k is small); reject without allocating
        // when the buffer is full and `a` cannot displace anything.
        var n = b; var size = 0
        var last: Entry = null
        while (n.nonEmpty) { last = n.head; size += 1; n = n.tail }
        if (size >= k && sortsAfterLast(last, a)) b else insert(b, a, k)
      }
      def merge(b1: List[Entry], b2: List[Entry]): List[Entry] = mergeLists(b1, b2, k)
      def finish(r: List[Entry]): Seq[Entry] = r
      def bufferEncoder: Encoder[List[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
      def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }.toColumn
  }
}
