package graft.queries

/** Release every memoized per-(session, dir) index artifact held by the
  * query registries (shingle/pair/signature/fingerprint tables, IVF
  * lists, SRP signatures). Bench calls this between its warmup and timed
  * passes; long-lived sessions can call it to reclaim executor storage.
  */
object QueryCaches {
  def clear(): Unit = {
    DedupQueries.clearCaches()
    SimQueries.clearCaches()
    AnalyticsQueries.clearCaches()
    CurationQueries.clearCaches()
    PipelineQueries.clearCaches()
  }
}
