package graft.operators

import scala.collection.concurrent.TrieMap

/** Umbrella for the session-scoped ingest artifacts the dedup/similarity
  * operators cache (pair lists, set groups, MinHash band tables, cluster
  * labels, IVF/PQ indexes, quality-model weights). At 100 TB these are
  * materialized tables written at ingest; in-session they are keyed
  * caches — clear them when a corpus is re-ingested under the same key
  * or to reclaim executor storage in a long-lived session.
  *
  * BOUNDED since round 9: every artifact cache routes its memoization
  * through [[memo]], which caps entries at [[MaxEntriesPerCache]]
  * distinct keys. The caches key by corpus/table identity, so growth
  * happens only in sessions that cycle many corpora; when the cap is
  * hit the WHOLE cache is evicted (artifacts for a key that has rotated
  * out of a 64-corpus window are dead weight — a full reset with
  * unpersist is simpler and safer than LRU bookkeeping over persisted
  * DataFrames, and the next call just rebuilds its artifact). Explicit
  * lifecycle control stays available via [[clearAll]] / the per-module
  * `clearArtifacts()`.
  */
object Artifacts {

  /** Max distinct keys an artifact cache retains before a full evict. */
  val MaxEntriesPerCache = 64

  /** Bounded getOrElseUpdate with eviction: on a miss at capacity, every
    * cached value is released through `evict` (unpersist for persisted
    * frames; a no-op for plain values) and the cache reset before the
    * new artifact builds. Thread-safe to the same degree as the previous
    * bare `getOrElseUpdate` sites (TrieMap CAS; a racing duplicate build
    * is wasted work, never wrong results). */
  def memo[K, V](cache: TrieMap[K, V], key: K, evict: V => Unit = { (_: V) => () })(
      build: => V): V =
    cache.get(key) match {
      case Some(v) => v
      case None =>
        // Single-winner build: TrieMap.getOrElseUpdate may evaluate the
        // thunk on several racing threads and discard the losers — for
        // side-effectful artifacts (persisted DataFrames) a discarded
        // loser is a leaked cache entry. Double-checked under the cache
        // monitor so exactly one thread builds (and evicts).
        cache.synchronized {
          cache.get(key) match {
            case Some(v) => v
            case None =>
              if (cache.size >= MaxEntriesPerCache) {
                cache.values.foreach(v =>
                  try evict(v) catch { case _: Throwable => () })
                cache.clear()
              }
              val v = build
              cache.put(key, v)
              v
          }
        }
    }

  /** Evictor for persisted-DataFrame artifacts. */
  val unpersistDf: org.apache.spark.sql.DataFrame => Unit =
    df => df.unpersist(false)

  private val scalarCache = TrieMap[String, Any]()

  /** Memoized driver-side scalar ingest artifact (corpus counts, token
    * totals, query vectors). The scalar-artifact precedent fetches these
    * eagerly so the consuming plan inlines a literal instead of planning
    * a 1-row nested-loop join — memoizing per corpus key makes that
    * fetch once-per-session, so steady-state plan construction runs
    * ZERO Spark jobs (pinned by LazyRegistrySpec). Values here are
    * plain JVM data, never session-bound handles — safe across session
    * restarts, unlike persisted DataFrames. */
  def scalar[T](key: String)(build: => T): T =
    memo(scalarCache, key)(build.asInstanceOf[Any]).asInstanceOf[T]

  def clearAll(): Unit = {
    scalarCache.clear()
    CorpusPipeline.clearArtifacts()
    DedupQueries.clearArtifacts()
    IncrementalDedup.clearArtifacts()
    Clustering.clearArtifacts()
    Similarity.clearArtifacts()
    CurationOps.clearArtifacts()
    Graph.clearArtifacts()
    QualityModel.clearCache()
    TextQueries.clearArtifacts()
    AssociationOps.clearArtifacts()
    Geo.clearArtifacts()
  }
}
