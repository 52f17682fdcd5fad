package graft.operators

/** Umbrella for the session-scoped ingest artifacts the dedup/similarity
  * operators cache (pair lists, set groups, MinHash band tables, cluster
  * labels, IVF indexes). At 100 TB these are materialized tables written
  * at ingest; in-session they are keyed caches — clear them when a corpus
  * is re-ingested under the same key or to reclaim executor storage in a
  * long-lived session. */
object Artifacts {
  def clearAll(): Unit = {
    DedupQueries.clearArtifacts()
    IncrementalDedup.clearArtifacts()
    Clustering.clearArtifacts()
    Similarity.clearArtifacts()
    CurationOps.clearArtifacts()
    Graph.clearArtifacts()
  }
}
