package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental (cross-snapshot) corpus dedup — the reference's defining
  * change-detection behavior (hash vs stored `latest-feed-hash`,
  * dags/warsaw-gtfs.py:60-71, engine-side [[graft.pipeline.FeedState]])
  * lifted from feed-bytes granularity to corpus granularity: the first
  * thing every recurring training-data ingest does is anti-join the new
  * batch against the state of everything already ingested.
  *
  * State = two append-only parquet tables under `statePath`:
  *  - `digests/` (digest STRING) — exact-dup state, sha-256 of text
  *  - `bands/` (band INT, band_key STRING) — near-dup state, MinHash LSH
  *    band keys at 2 bands × 6 rows (threshold ≈ (1/2)^(1/6) ≈ 0.89,
  *    matched to the J ≥ 0.9 near-dup joins elsewhere in the engine)
  *
  * A batch doc survives iff its digest is unseen AND none of its band
  * keys is seen — i.e. it is neither an exact copy nor an LSH-candidate
  * near-dup of any previously ingested doc.
  *
  * 100 TB design: both checks are left-anti/left-semi equality joins on
  * narrow keys (32-byte digest / 32-hex band digest) — shuffle-keyed,
  * never a scan of prior batches' text, and the text column never
  * re-shuffles (only ids and digests move). State grows by O(new docs)
  * rows per ingest; at warehouse scale bucket both state tables by their
  * key so the anti-joins co-locate without a state-side shuffle, and
  * compact appends periodically.
  */
object IncrementalDedup {

  val Bands = 2
  val Rows = 6

  /** Exact-dup state rows for a corpus slice. */
  def digestsOf(docs: DataFrame): DataFrame =
    docs.select(sha2(col("text"), 256).as("digest"))

  /** Near-dup state rows: (doc_id, band, band_key). */
  def bandsOf(docs: DataFrame): DataFrame =
    DedupQueries.minhashBands(docs, bands = Bands, rows = Rows)

  private val digestCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** (doc_id, digest) corpus artifact: one sha-256 pass per landed
    * corpus, shared by every digest consumer (both declared incremental
    * variants slice it into their state and batch sides) — the digest
    * sibling of [[DedupQueries.minhashBands]]'s band-key artifact. */
  def docDigests(docs: DataFrame,
      cacheKey: Option[String] = None): DataFrame = {
    def build(): DataFrame =
      docs.select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    cacheKey match {
      case Some(k) =>
        Artifacts.memo(digestCache, k, Artifacts.unpersistDf)(
          build().localCheckpoint(true))
      case None => build()
    }
  }

  private val bloomCache =
    scala.collection.concurrent.TrieMap[String, Array[Byte]]()

  /** Drop cached digest/Bloom artifacts (see
    * [[DedupQueries.clearArtifacts]]). */
  def clearArtifacts(): Unit = {
    digestCache.values.foreach(df =>
      try df.unpersist(false) catch { case _: Throwable => () })
    digestCache.clear()
    bloomCache.clear()
  }

  /** Batch docs new w.r.t. state, annotated with their digest. Output
    * keeps every batch column plus `digest`.
    *
    * `batchBands`: optionally supply precomputed per-doc band keys
    * covering (a superset of) the batch — band keys are per-doc, so when
    * state and batch slice one corpus table the signature pass can run
    * once for both sides instead of once per side. */
  def newDocs(batch: DataFrame, stateDigests: DataFrame,
      stateBands: DataFrame,
      batchBands: Option[DataFrame] = None): DataFrame =
    newDocsDigested(batch.withColumn("digest", sha2(col("text"), 256)),
      stateDigests, stateBands, batchBands)

  /** [[newDocs]] for a batch that already carries its `digest` column
    * (e.g. a [[docDigests]] artifact slice) — skips the sha-256 pass.
    * No distinct on the state side: anti-join semantics are insensitive
    * to right-side duplicates, and state digests are unique by the
    * ingest contract anyway — a distinct here planned an exchange +
    * aggregation for nothing. */
  def newDocsDigested(digested: DataFrame, stateDigests: DataFrame,
      stateBands: DataFrame,
      batchBands: Option[DataFrame] = None): DataFrame = {
    val exactNew = digested
      .join(stateDigests.select("digest"), Seq("digest"), "left_anti")
    dropNearDups(exactNew, stateBands, batchBands)
  }

  /** The OTHER Bloom direction — the one Catalyst's own runtime-filter
    * injection uses: build the Bloom over the BATCH digests and prune
    * the STATE side of the exact anti-join with it, map-side. A state
    * row whose digest is in no batch row cannot affect a left-anti
    * join, and Bloom false positives merely leave harmless extra state
    * rows for the exact join to ignore — so results are bit-identical
    * to [[newDocs]] by construction. This direction wins when state ≫
    * batch (the recurring-ingest steady state: the 10-year corpus is
    * the state, today's crawl is the batch) — the state scan collapses
    * to ~|batch dups + fpp| rows BEFORE it is broadcast or shuffled,
    * and the plan keeps the plain path's single-join shape (the probe
    * is a scan-level filter, not an extra join stage). The batch-probe
    * form [[newDocsBloomDigested]] wins the opposite regime (batch ≫
    * state); [[newDocsBloomBucketed]] is the no-single-bitmap scale
    * path. */
  def newDocsBloomStatePruned(digested: DataFrame, stateDigests: DataFrame,
      stateBands: DataFrame, expectedItems: Long = 100000L,
      fpp: Double = 0.01,
      batchBands: Option[DataFrame] = None,
      prebuilt: Option[Array[Byte]] = None): DataFrame = {
    val bloom = prebuilt.getOrElse(
      graft.functions.Bloom.build(digested, col("digest"),
        expectedItems, fpp))
    val pruned =
      if (bloom == null) stateDigests.limit(0) // empty batch
      else stateDigests.filter(coalesce(
        graft.functions.Bloom.mightContain(bloom, col("digest")),
        lit(false))) // null state digest equals no batch digest
    newDocsDigested(digested, pruned, stateBands, batchBands)
  }

  /** Near-dup phase shared by [[newDocs]] and [[newDocsBloom]]: drop every
    * exact-new doc with any band-key hit in state. */
  private def dropNearDups(exactNew: DataFrame, stateBands: DataFrame,
      batchBands: Option[DataFrame]): DataFrame = {
    val bands = batchBands match {
      case Some(b) => b.join(exactNew.select("doc_id"), Seq("doc_id"), "left_semi")
      case None    => bandsOf(exactNew)
    }
    // doc-level near-dup drop: any band-key hit in state marks the doc.
    // No distinct on either semi/anti right side — both joins are
    // insensitive to right-side duplicates, and each distinct planned an
    // exchange + aggregation the join didn't need
    val nearDupIds = bands
      .join(stateBands.select("band", "band_key"),
        Seq("band", "band_key"), "left_semi")
      .select("doc_id")
    exactNew.join(nearDupIds, Seq("doc_id"), "left_anti")
  }

  /** [[newDocs]] with a Bloom pre-filter on the exact-dup phase: a
    * native `bloom_filter_agg` over the state digests (distributed
    * aggregation; only the compact bitmap reaches the driver) gates the
    * anti-join so that only bloom-POSITIVE rows — known dups plus ~fpp
    * false positives — enter the digest shuffle; the probe itself is the
    * codegen'd `might_contain` predicate on a narrow (doc_id, digest)
    * projection, so the batch's payload columns never shuffle and
    * nothing is materialized (the old scalar-UDF + full-batch
    * localCheckpoint formulation cost more than the anti-join it saved).
    * Survivors are recovered by anti-joining the batch against the
    * confirmed-dup id set, which is small enough for AQE to broadcast —
    * net: the wide batch rows take ZERO shuffles through the exact
    * phase. Results are bit-identical to [[newDocs]] (asserted in
    * LayoutSpec and by the shared DuckDB oracle); requires `doc_id` to
    * key batch rows uniquely (which [[dropNearDups]] already assumes).
    *
    * 100 TB sizing honesty: one monolithic Bloom over 10¹⁰ state digests
    * is ~12 GB at 1% fpp — too big to broadcast. At that scale use
    * [[newDocsBloomBucketed]] (one Bloom per digest bucket, each batch
    * bucket probed against its own filter), or scope the Bloom to the
    * hot recent-delta state while cold state keeps the plain anti-join. */
  def newDocsBloom(batch: DataFrame, stateDigests: DataFrame,
      stateBands: DataFrame, expectedItems: Long = 100000L,
      fpp: Double = 0.01,
      batchBands: Option[DataFrame] = None): DataFrame =
    // Convenience form: the digest column here is LAZY, so the two
    // downstream scans that read it (the bloom-positive probe and the
    // survivor recovery join) each recompute sha-256 over the batch
    // text (scans that don't read `digest` don't pay — column pruning
    // drops it). For repeated/large-batch use, digest once into a
    // materialized narrow artifact and call [[newDocsBloomDigested]]
    // directly — the declared queries do exactly that via the session
    // docDigests artifact.
    newDocsBloomDigested(batch.withColumn("digest", sha2(col("text"), 256)),
      stateDigests, stateBands, expectedItems, fpp, batchBands)

  /** [[newDocsBloom]] for a batch already carrying `digest` — see
    * [[newDocsDigested]]. `prebuilt`: a serialized filter from
    * [[graft.functions.Bloom.build]] over exactly `stateDigests` — at
    * warehouse scale the Bloom is a persisted per-state-table artifact
    * (rebuilt when state appends, like the IVF index), not something
    * every probing query re-aggregates. */
  def newDocsBloomDigested(digested: DataFrame, stateDigests: DataFrame,
      stateBands: DataFrame, expectedItems: Long = 100000L,
      fpp: Double = 0.01,
      batchBands: Option[DataFrame] = None,
      prebuilt: Option[Array[Byte]] = None): DataFrame = {
    val bloom = prebuilt.getOrElse(
      graft.functions.Bloom.build(stateDigests, col("digest"),
        expectedItems, fpp))
    val exactNew =
      if (bloom == null) digested // empty state: every batch row is new
      else {
        val hit = coalesce(
          graft.functions.Bloom.mightContain(bloom, col("digest")),
          lit(false)) // null digest = definitely unseen, as in newDocs
        // Only bloom-POSITIVE rows (true dups + ~fpp false positives)
        // enter the digest join, and they enter it as a narrow
        // (doc_id, digest) projection — payload columns never shuffle.
        // Survivors are recovered with an anti-join against the
        // confirmed-dup id set, which is ≤ the batch's dup count and
        // broadcasts. (A union of filter(!hit) and filter(hit)⟕state
        // branches is semantically equal and avoids the recovery join,
        // but the downstream near-dup phase consumes exactNew twice,
        // re-evaluating both branches each time — measured slower.)
        val dupIds = digested.select("doc_id", "digest").filter(hit)
          .join(stateDigests.select("digest"), Seq("digest"), "left_semi")
          .select("doc_id")
        digested.join(dupIds, Seq("doc_id"), "left_anti")
      }
    dropNearDups(exactNew, stateBands, batchBands)
  }

  /** The 100 TB shape of [[newDocsBloom]] — the partitioned-Bloom path
    * its monolithic variant's docstring promises: state digests are
    * hash-bucketed (`pmod(xxhash64(digest), nBuckets)`), ONE aggregation
    * pass builds a Bloom per bucket (`groupBy(bucket)` +
    * `bloom_filter_agg`, so filter count scales with bucket count while
    * each bitmap stays broadcast-sized), and each batch row probes
    * exactly its own bucket's filter. No single bitmap ever covers the
    * full state: 10¹⁰ digests over 1024 buckets is 1024 × ~12 MB
    * filters, each an ordinary broadcast, instead of one impossible
    * 12 GB one.
    *
    * The per-bucket probe compiles to a union of per-bucket codegen'd
    * `might_contain` filters over the narrow (doc_id, digest)
    * projection. On a warehouse where batch and state are bucketed ON
    * DISK by the same digest hash, each branch prunes to one bucket
    * directory, so the union reads the batch once overall; the bloom
    * table itself is a tiny per-bucket artifact that would persist next
    * to the state table rather than rebuild per ingest. Buckets with no
    * state rows have no filter and contribute no probe branch — their
    * batch rows are new by construction. Results are bit-identical to
    * [[newDocs]] (asserted in LayoutSpec on a multi-bucket fixture).
    *
    * DRIVER BUDGET — the honest bound on this regime: the per-bucket
    * bitmaps are COLLECTED to the driver and each becomes a plan branch,
    * so driver memory grows as nBuckets × bitmap-size (≈12 MB at 10⁷
    * items / 1% fpp) and the plan carries nBuckets union branches.
    * [[MaxBloomBuckets]] (256) caps both: ≤ ~3 GB of bitmaps and a plan
    * Catalyst still analyzes in seconds — which at 12 MB per filter
    * covers ~2.5·10⁹ state digests. Past that, this path is the wrong
    * tool by design: don't raise the cap, switch to the state-pruned
    * runtime-filter regime ([[newDocsBloom]] with digest-range pruning —
    * the DECLARED variant, whose bitmap covers only the state slice a
    * batch can touch) or probe buckets as sequential per-bucket jobs so
    * at most one bitmap is resident at a time. */
  val MaxBloomBuckets = 256

  def newDocsBloomBucketed(batch: DataFrame, stateDigests: DataFrame,
      stateBands: DataFrame, nBuckets: Int = 8,
      expectedItemsPerBucket: Long = 100000L, fpp: Double = 0.01,
      batchBands: Option[DataFrame] = None): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(nBuckets <= MaxBloomBuckets,
      s"nBuckets=$nBuckets exceeds MaxBloomBuckets=$MaxBloomBuckets: " +
        "the bucketed regime collects one Bloom bitmap per bucket to the " +
        "driver and plans one union branch per bucket; past the cap use " +
        "the state-pruned runtime-filter regime (newDocsBloom) or " +
        "sequential per-bucket probe jobs instead")
    val digested = batch.withColumn("digest", sha2(col("text"), 256))
    def bucketOf(c: Column): Column = pmod(xxhash64(c), lit(nBuckets.toLong))
    graft.functions.Bloom.ensureCapacity(stateDigests.sparkSession,
      expectedItemsPerBucket, fpp)
    val blooms = stateDigests
      .groupBy(bucketOf(col("digest")).as("bucket"))
      .agg(graft.functions.Bloom.bloomAgg(col("digest"),
        expectedItemsPerBucket, fpp).as("bf"))
      .collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Array[Byte]]("bf"))
      .filter(_._2 != null)
    val narrow = digested.select(col("doc_id"), col("digest"))
    val hits = blooms.map { case (b, bf) =>
      narrow.filter(bucketOf(col("digest")) === lit(b))
        .filter(coalesce(
          graft.functions.Bloom.mightContain(bf, col("digest")), lit(false)))
    }.reduceOption(_.unionByName(_))
    val exactNew = hits match {
      case None => digested // empty state
      case Some(h) =>
        val dupIds = h
          .join(stateDigests.select("digest"), Seq("digest"), "left_semi")
          .select("doc_id")
        digested.join(dupIds, Seq("doc_id"), "left_anti")
    }
    dropNearDups(exactNew, stateBands, batchBands)
  }

  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readState(spark: SparkSession, path: String,
      empty: DataFrame): DataFrame =
    if (pathExists(spark, path)) spark.read.schema(empty.schema).parquet(path)
    else empty

  /** One ingest round: filter `batch` against the state under `statePath`,
    * append the survivors' digests and band keys, return the survivors.
    * State is written AFTER the survivor set materializes (same
    * state-written-last ordering fix as [[graft.pipeline.GtfsIngest]]);
    * re-ingesting the same batch is then a no-op (every digest already in
    * state), which makes crash-rerun safe without a transaction log.
    *
    * The two state appends cannot be atomic without a commit log, so
    * their ORDER decides the failure mode of a crash between them:
    * bands first means a rerun sees the crashed docs' own band keys and
    * re-drops them — a conservative false-drop (and any later copy is
    * likewise dropped, so no duplicate ever lands). The reverse order
    * (digests first) would leave a permanent NEAR-DUP HOLE: rerun finds
    * the digest, never appends the bands, and later near-dups of those
    * docs sail through the band check forever. A dedup state prefers
    * the former. */
  def ingest(spark: SparkSession, batch: DataFrame,
      statePath: String): DataFrame =
    ingestWith(spark, batch, statePath)(_ => ())

  /** [[ingest]] with a survivor sink invoked BEFORE state is appended —
    * the hook streaming needs for crash-safe output ordering (see
    * [[streamIngest]]): if the sink commits and the state append
    * doesn't, a rerun recomputes the same survivors; if state commits
    * and the sink already ran, the docs are both landed and protected.
    * Output-after-state (the naive order) silently LOSES docs on
    * micro-batch replay: state marks them ingested, so the replay
    * yields zero survivors and the sink never sees them. */
  /** Test seam (graft.tools.StreamSoak): invoked between the bands
    * append and the digests append — the exact crash window whose
    * ordering the [[ingest]] docstring pins. Production value is a
    * no-op; the soak's crash phase swaps in `Runtime.halt`. */
  private[graft] var afterBandsHook: () => Unit = () => ()

  def ingestWith(spark: SparkSession, batch: DataFrame,
      statePath: String)(sink: DataFrame => Unit): DataFrame = {
    val digestsPath = s"$statePath/digests"
    val bandsPath = s"$statePath/bands"
    val emptyDocs = batch.limit(0)
    val stateDigests = readState(spark, digestsPath, digestsOf(emptyDocs))
    val stateBands = readState(spark, bandsPath,
      bandsOf(emptyDocs).select("band", "band_key"))
    // Eager localCheckpoint, not persist: the survivor plan reads the
    // state parquet, which the appends below grow — a cache-evicted
    // recompute after the append would anti-join the batch against its
    // own digests and silently return empty. Checkpointing cuts that
    // lineage before state is touched.
    val survivors = newDocs(batch, stateDigests, stateBands)
      .localCheckpoint(true)
    sink(survivors)
    bandsOf(survivors).select("band", "band_key")
      .write.mode(SaveMode.Append).parquet(bandsPath)
    afterBandsHook()
    survivors.select("digest")
      .write.mode(SaveMode.Append).parquet(digestsPath)
    survivors
  }

  /** [[ingest]] at VECTOR granularity: filter a (vec_id, embedding)
    * batch against the bucketed-vector state under `statePath/vecs`
    * (rows in [[Similarity.quantBucketed]] shape — milli-quantized
    * vectors under their sign-LSH buckets, a narrow keyed table), append
    * the survivors' bucketed rows AFTER the survivor set materializes,
    * return the surviving batch rows. Same state-written-last +
    * rerun-idempotence contract as the text path: re-ingesting a batch
    * is a no-op because every vector is an exact (cosine = 1) near-dup
    * of its own state row. Like [[ingest]], the check is batch-vs-state;
    * in-batch dedup is [[Similarity.lshNearDupPairsQ]]'s job. */
  def ingestEmbeddings(spark: SparkSession, batch: DataFrame,
      statePath: String, tables: Int = 2, nbits: Int = 4, dim: Int = 64,
      cosSq1e4: Long = 2025L): DataFrame =
    ingestEmbeddingsWith(spark, batch, statePath, tables, nbits, dim,
      cosSq1e4)(_ => ())

  /** [[ingestEmbeddings]] with a survivor sink invoked BEFORE the state
    * append — same crash-safe output ordering as [[ingestWith]]. */
  def ingestEmbeddingsWith(spark: SparkSession, batch: DataFrame,
      statePath: String, tables: Int = 2, nbits: Int = 4, dim: Int = 64,
      cosSq1e4: Long = 2025L)(sink: DataFrame => Unit): DataFrame = {
    val vecsPath = s"$statePath/vecs"
    val emptyState = Similarity.quantBucketed(batch.limit(0), "vec_id",
      "embedding", tables, nbits, dim)
    val state = readState(spark, vecsPath, emptyState)
    val newIds = Similarity.embedNewIds(batch, "vec_id", "embedding",
      state, tables, nbits, dim, cosSq1e4)
      .localCheckpoint(true) // cut lineage before the append grows state
    val survivors = batch.join(newIds.select(col("id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    sink(survivors)
    Similarity.quantBucketed(survivors, "vec_id", "embedding",
        tables, nbits, dim)
      .write.mode(SaveMode.Append).parquet(vecsPath)
    survivors
  }

  /** Streaming corpus ingest: run every micro-batch of a (doc_id, text)
    * stream through [[ingest]], so the digest/band state dedups ACROSS
    * micro-batches (and across restarts — the state tables persist).
    * Survivors append to `outDir`.
    *
    * foreachBatch rather than dropDuplicatesWithinWatermark because
    * corpus identity has no event-time horizon: a document is a dup of
    * one ingested last month. State here is the same append-only keyed
    * parquet the batch path uses, not executor state-store rows, so batch
    * and streaming ingests can interleave against one corpus state.
    * Crash-replay ordering (foreachBatch is not transactional): each
    * micro-batch writes its survivors into a BATCH-KEYED subdirectory
    * of `outDir` BEFORE state is appended ([[ingestWith]]). Replay
    * after a crash then re-lands the same survivor set over the same
    * directory — idempotent — where output-after-state would see the
    * replayed docs already in state and silently drop them from the
    * corpus forever. The one remaining window (state fully appended,
    * checkpoint commit lost) replays to an EMPTY survivor set; the
    * empty-skip guard leaves the previously landed directory intact
    * rather than overwriting it with nothing.
    *
    * `gate` runs on each micro-batch BEFORE dedup — the quality→dedup
    * order of the batch curation pipeline (rejected docs must not claim
    * digests in state, or a later clean duplicate would be suppressed
    * by a doc that never landed). Map-side gates (e.g.
    * `TextQueries.gopherGate(_).filter(col("keep"))
    * .select("doc_id", "text")`) add no shuffle to the micro-batch. */
  def streamIngest(spark: SparkSession, docs: DataFrame, statePath: String,
      outDir: String, checkpointDir: String,
      gate: DataFrame => DataFrame = identity)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val dest = s"$outDir/batch=$batchId"
        ingestWith(batch.sparkSession, gate(batch.toDF()), statePath) { s =>
          if (!s.isEmpty || !pathExists(batch.sparkSession, dest))
            s.write.mode(SaveMode.Overwrite).parquet(dest)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** [[streamIngest]] at vector granularity: every micro-batch of a
    * (vec_id, embedding) stream runs through [[ingestEmbeddingsWith]],
    * so near-dup state spans micro-batches and restarts. Same
    * batch-keyed output-before-state ordering as the text path: replay
    * re-lands the same survivors idempotently instead of losing them to
    * an already-appended state. */
  def streamIngestEmbeddings(spark: SparkSession, vecs: DataFrame,
      statePath: String, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val dest = s"$outDir/batch=$batchId"
        ingestEmbeddingsWith(batch.sparkSession, batch.toDF(), statePath) { s =>
          if (!s.isEmpty || !pathExists(batch.sparkSession, dest))
            s.write.mode(SaveMode.Overwrite).parquet(dest)
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  type Q = (SparkSession, String) => DataFrame

  /** Declared incremental-dedup query: even doc_ids are the previously
    * ingested corpus (state), odd doc_ids are the new batch. Survivors =
    * odd docs that are neither exact copies nor MinHash-band near-dup
    * candidates of any even doc. Fully deterministic (sha-256 + md5
    * band keys) → exact DuckDB oracle. */
  val qDedupIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    // band keys and digests are per-doc: one signature pass and one
    // sha-256 pass over the whole table serve both the state side and
    // the batch side (corpus artifacts, shared with every other
    // banding/digest consumer of this fixture)
    val allBands = DedupQueries.minhashBands(docs, bands = Bands, rows = Rows,
      cacheKey = Some(s"docs:$d:all"))
    val allDigests = docDigests(docs, cacheKey = Some(s"docs:$d:digests"))
    // no presentation sort: the correctness gate row-sorts before
    // hashing, and a global orderBy would cost a range-boundary
    // sampling job on top of the anti-join chain
    newDocsDigested(allDigests.filter(col("doc_id") % 2 === 1),
      allDigests.filter(col("doc_id") % 2 === 0).select("digest"),
      allBands.filter(col("doc_id") % 2 === 0).select("band", "band_key"),
      batchBands = Some(allBands.filter(col("doc_id") % 2 === 1)))
      .select(col("doc_id"), col("digest"))
  }

  /** The Bloom-prefilter path under the same oracle: results must be
    * bit-identical to [[qDedupIncremental]] (the Bloom only prunes
    * state rows that can touch no batch row; false positives are
    * absorbed by the exact join), so it shares that query's DuckDB
    * oracle — the q_agg_salted precedent of putting an
    * execution-strategy variant under the plain-SQL gate it must be
    * indistinguishable from. */
  val qDedupIncrementalBloom: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val allBands = DedupQueries.minhashBands(docs, bands = Bands, rows = Rows,
      cacheKey = Some(s"docs:$d:all"))
    val allDigests = docDigests(docs, cacheKey = Some(s"docs:$d:digests"))
    val batch = allDigests.filter(col("doc_id") % 2 === 1)
    // the serialized filter is an ingest artifact like the band table:
    // built once per landed batch, reused by every probing run
    // sized to the actual batch (fixture ≤ 5k odd docs): a Bloom literal
    // rides serialized inside every stage that evaluates the probe, so
    // overshooting expectedItems 20× taxes plan shipping for nothing
    val bloom = bloomCache.get(s"docs:$d:bloomOdd").getOrElse {
      val b = graft.functions.Bloom.build(batch, col("digest"), 10000L, 0.01)
      if (b != null) bloomCache.put(s"docs:$d:bloomOdd", b) // null = empty
      b
    }
    // state-pruned direction: state ≫ batch is the recurring-ingest
    // steady state, so the declared variant demonstrates the regime the
    // operator family exists for (the batch-probe and bucketed forms are
    // the library's other two regimes, LayoutSpec-equivalence-tested)
    newDocsBloomStatePruned(batch,
      allDigests.filter(col("doc_id") % 2 === 0).select("digest"),
      allBands.filter(col("doc_id") % 2 === 0).select("band", "band_key"),
      batchBands = Some(allBands.filter(col("doc_id") % 2 === 1)),
      prebuilt = Option(bloom))
      .select(col("doc_id"), col("digest"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_incremental" -> qDedupIncremental,
    "q_dedup_incremental_bloom" -> qDedupIncrementalBloom)

  /** Shared by both declared variants — the Bloom path must be
    * indistinguishable from the plain anti-join in its results. */
  private val incrementalOracle: String =
      """WITH exact_new AS (
           SELECT doc_id, sha256(text) AS digest FROM documents
           WHERE doc_id % 2 = 1
             AND sha256(text) NOT IN
               (SELECT sha256(text) FROM documents WHERE doc_id % 2 = 0)),
         tok AS (
           SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         h AS (
           SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || tok) AS hv
           FROM tok, (SELECT unnest(generate_series(0, 11)) AS i)),
         s AS (SELECT doc_id, i, MIN(hv) AS sig FROM h GROUP BY doc_id, i),
         bands AS (
           SELECT doc_id, i // 6 AS band,
             md5(string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || '=' || sig,
                 '|' ORDER BY i)) AS band_key
           FROM s GROUP BY doc_id, i // 6),
         near AS (
           SELECT DISTINCT b.doc_id
           FROM bands b JOIN bands st
             ON b.band = st.band AND b.band_key = st.band_key
           WHERE b.doc_id % 2 = 1 AND st.doc_id % 2 = 0)
         SELECT doc_id, digest FROM exact_new
         WHERE doc_id NOT IN (SELECT doc_id FROM near)
         ORDER BY doc_id"""

  val oracleSql: Map[String, String] = Map(
    "q_dedup_incremental" -> incrementalOracle,
    "q_dedup_incremental_bloom" -> incrementalOracle)
}
