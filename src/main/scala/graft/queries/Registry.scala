package graft.queries

/** All oracle-checked queries, one per operator claimed in SURVEY.md §2. */
object Registry {
  val all: Seq[Q] =
    EventQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ AnalyticsQueries.all ++
      RelationalQueries2.all ++ StatsQueries.all ++ ScaleQueries.all ++
      SubqueryQueries.all ++ SketchQueries.all ++ PipelineQueries.all ++
      CurationQueries.all ++ FilterQueries.all ++ PcaQuery.all ++
      PqQuery.all ++ IvfPqQuery.all ++ SearchQueries.all ++
      TokenizeQuery.all ++ CdcQuery.all ++ ScrubQuery.all ++
      NormalizeQuery.all ++ FilterGateQuery.all ++ QuantizeQuery.all ++
      WinsorizeQuery.all ++ RunTreeQuery.all ++ PqDriftQuery.all ++
      AnnCostQuery.all ++ DedupCostQuery.all ++ BloomSuppressQuery.all ++
      SkippingQueries.all ++ JsonlQuery.all ++ SnapshotDiffQuery.all ++
      ResampleQuery.all ++ ShreddedQuery.all ++ RollupQuery.all ++
      ForgetQueries.all ++
      Seq(LogRoundtripQuery.roundtrip, LogInteropQuery.interop,
        DedupClusterQuery.clusters, DedupClusterQuery.canonicalDocs)

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
