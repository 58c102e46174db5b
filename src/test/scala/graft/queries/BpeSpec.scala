package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** t12 pinned against an INDEPENDENT plain-Scala BPE: symbol sequences as
  * integer lists (no string/replace machinery), greedy left-to-right
  * non-overlapping merge, overlapping pair counts. Agreement between the
  * two constructions (string-replace over char-mapped docs vs list-scan)
  * is the evidence that the engine implements BPE, not just its own oracle.
  *
  * The fixture forces the semantics the driver corpus never exercises:
  * an "x x x x" run (overlap counting: 3 pairs; greedy merge: 2
  * occurrences, the shared middle NOT reused), and a frequency tie broken
  * by symbol order.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** Reference BPE. Symbol ids reproduce the engine's alphabet order:
    * vocab tokens at 32+alphabetical-rank, round-r merges at id r (so all
    * merged symbols sort before all vocab symbols, in round order). Stops
    * early when no adjacent pair remains, like the engine.
    */
  private def referenceBpe(texts: Seq[String], rounds: Int): Seq[(Int, String, Long)] = {
    val tokenize = (t: String) =>
      t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toList
    val vocab = texts.flatMap(tokenize).distinct.sorted
    val id = vocab.zipWithIndex.map { case (t, i) => t -> (32 + i + 1) }.toMap
    val text = scala.collection.mutable.Map[Int, String](id.map(_.swap).toSeq: _*)
    var docs = texts.map(t => tokenize(t).map(id))

    def mergeGreedy(doc: List[Int], pair: (Int, Int), m: Int): List[Int] = doc match {
      case a :: b :: rest if (a, b) == pair => m :: mergeGreedy(rest, pair, m)
      case a :: rest                        => a :: mergeGreedy(rest, pair, m)
      case Nil                              => Nil
    }

    (1 to rounds).iterator.map { r =>
      val counts = docs.flatMap(_.sliding(2).collect { case List(a, b) => (a, b) })
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) None
      else {
        val (pair, freq) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        text(r) = text(pair._1) + " " + text(pair._2)
        docs = docs.map(mergeGreedy(_, pair, r))
        Some((r, text(r), freq))
      }
    }.takeWhile(_.isDefined).flatten.toSeq
  }

  private val texts = Seq(
    "x x x x y z",        // run of four: 3 overlapping xx pairs, 2 greedy merges
    "x x y z y z",        // yz twice here...
    "y z w w",            // ...and once here: yz reaches 3, beating xx post-merge
    "w x x y z",
    "q q q"               // odd run: greedy leaves a trailing singleton
  )

  private lazy val engine = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    T12BpeMerges.runOn(spark, docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
  }

  test("six merge rounds match the independent list-scan reimplementation") {
    assert(engine == referenceBpe(texts, T12BpeMerges.rounds))
  }

  test("overlap semantics: adjacent-pair counts are overlapping, merges are not") {
    // Round 1 must pick ("x","x"): 3 pairs from the run of four + 1 + 1 = 5,
    // vs 4 for ("y","z"). If counting were non-overlapping, xx would tie yz
    // at 4 and lose the tie-break (x sorts after nothing here — yz would win
    // on count elsewhere); if merging were overlapping, later rounds drift.
    assert(engine.head._2 == "x x")
    assert(engine.head._3 == 5L)
  }

  test("merged symbols participate in later rounds (multi-word units grow)") {
    assert(engine.exists(m => m._2.split(" ").length >= 3),
      s"no 3+-token merged unit in ${engine.map(_._2)}")
  }

  test("degenerate corpus (no adjacent pairs anywhere) stops early instead of crashing") {
    val lone = Seq("x", "y .", ", z ,", "")
    val docs = lone.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = T12BpeMerges.runOn(spark, docs).collect()
    assert(merges.isEmpty, s"expected no merges, got ${merges.mkString(",")}")
    assert(referenceBpe(lone, T12BpeMerges.rounds).isEmpty)
  }

  test("exhaustion mid-budget: rounds stop when the corpus is fully merged") {
    // One doc of 3 distinct tokens: round 1 merges a pair, round 2 merges
    // the rest into a single symbol, round 3 finds no pair -> 2 rows only.
    val tiny = Seq("a b c")
    val docs = tiny.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = T12BpeMerges.runOn(spark, docs)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got.length == 2, s"expected 2 merge rows, got $got")
    assert(got == referenceBpe(tiny, T12BpeMerges.rounds))
    assert(got.last._2 == "a b c")
  }

  test("t13 encode: symbol counts shrink monotonically and cover every tokenized doc") {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (_, encoded) = T12BpeMerges.train(spark, docs)
    val rows = encoded.collect().map(r => r.getLong(0) -> r.getString(1).length).toMap
    encoded.unpersist()
    val tokenCounts = texts.zipWithIndex.map { case (t, i) =>
      i.toLong -> t.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty)
    }.toMap
    assert(rows.keySet == tokenCounts.keySet)
    for ((id, nSym) <- rows)
      assert(nSym <= tokenCounts(id), s"doc $id grew: $nSym > ${tokenCounts(id)}")
    assert(rows.exists { case (id, nSym) => nSym < tokenCounts(id) },
      "no document compressed — merges never applied")
  }
}
