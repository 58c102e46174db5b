package graft.queries

/** Single source of truth for the engine's declared query surface. Verify,
  * Bench, and SparkEntry all derive from this list.
  */
object Registry {
  val all: Seq[GraftQuery] = Seq(
    Q1Agg,
    Q2IterSum,
    Q3LrGradient,
    Q4LnrGradient,
    Q5KMeansAssign,
    Q6KMeansSeed,
    Q7GroupedAgg,
    Q8TaggedSink,
    Q9KMeansLoop,
    Q10Split,
    Q11Rollup,
    Q12Intersect,
    Q13Except,
    Q14Percentiles,
    Q15Pivot,
    Q16Distinct,
    Q17QualityChecks,
    Q18Cube,
    K1LrLoop,
    J4RangeJoin,
    J1JoinRevenue,
    J2TopK,
    J3AsOf,
    W1WindowAgg,
    W2Sessions,
    W3JsonExtract,
    W4DateFuncs,
    W5TrailingStats,
    D1ExactDedup,
    D2MinhashLsh,
    D3SimHash,
    D4NgramJaccard,
    D5EmbedDedup,
    D6SimhashPairs,
    D7DupClusters,
    S1AnnBrute,
    S2AnnLsh,
    S4AnnIvf,
    T1LangId,
    T2Quality,
    T3TokenCount,
    T4Fingerprint,
    T7RollingFingerprint,
    T5StringFuncs,
    T6Vocab,
    S3StratifiedSample,
    V1LabelCentroids,
    M1MultimodalMeta,
    M2FrameSample)

  def byName(name: String): GraftQuery =
    all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(s"unknown query: $name"))
}
