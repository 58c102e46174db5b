package graft.queries

/** Single source of truth for the engine's declared query surface. Verify,
  * Bench, and SparkEntry all derive from this list.
  */
object Registry {
  val all: Seq[GraftQuery] = Seq(
    Q1Agg,
    Q2IterSum,
    Q7GroupedAgg,
    Q10Split,
    D1ExactDedup,
    T4Fingerprint)

  def byName(name: String): GraftQuery =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"unknown query: $name"))
}
