package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Data-layout operators for multi-dimensional data skipping. Z-ordering
  * (Morton curve) maps points that are close in 2-D key space to nearby
  * positions on one linear curve, so a table SORTED by zkey before
  * writing gets parquet row-group min/max stats that are tight in BOTH
  * dimensions — a range filter on either column prunes row groups, where
  * a plain lexicographic sort only serves its leading column.
  *
  * The reference's layout story is 1-D date partitioning
  * (/root/reference/dags/warsaw-gtfs.py:90); this is the multi-column
  * generalization used at warehouse scale. The curve computation is pure
  * per-row integer bit arithmetic — exact, deterministic, map-side —
  * which also makes it one of the few layout operators with an exact
  * cross-engine oracle.
  */
object Layout {

  type Q = (SparkSession, String) => DataFrame

  /** 32-bit Morton (Z-order) interleave of the low 16 bits of `x` and
    * `y`: bit i of x lands at position 2i, bit i of y at 2i+1. Backed by
    * the native codegen'd [[graft.functions.MortonInterleave16]]
    * expression (branch-free magic-number bit spreading — the HOF
    * `aggregate(sequence(0,15), ...)` form interprets a lambda 16× per
    * row, the wrong shape for a key computed for every row at write
    * time). Column names must resolve in the input frame. */
  def morton16(xCol: String, yCol: String): Column =
    graft.functions.VectorFunctions.morton(col(xCol), col(yCol))

  /** Sort a frame onto the Z-curve of two integer dimensions — the write
    * path is `zorderBy(df, "a", "b").write.parquet(...)`: a range
    * repartition + in-partition sort by zkey (one shuffle), after which
    * every output file covers a compact curve segment. */
  def zorderBy(df: DataFrame, xCol: String, yCol: String,
      numPartitions: Int = 0): DataFrame = {
    val keyed = df.withColumn("__zkey", morton16(xCol, yCol))
    val ranged =
      if (numPartitions > 0) keyed.repartitionByRange(numPartitions, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    ranged.sortWithinPartitions("__zkey").drop("__zkey")
  }

  /** Bucketed write: pay the shuffle ONCE at write time. A table
    * bucketed (and sorted) by its join/agg key reads back with
    * `HashPartitioning(key, n)` already satisfied, so every later
    * equi-join or aggregation on that key plans ZERO exchanges — the
    * warehouse-scale answer to a fact-fact join that would otherwise
    * reshuffle 100 TB on every query. Both sides must share the bucket
    * count; LayoutSpec asserts the joined plan is exchange-free and
    * result-identical to the plain join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction: rewrite a parquet directory into
    * ⌈bytes/targetBytes⌉ files. The operational complement of the layout
    * writers — streaming ingests and fine partitioning both strew small
    * files, and at warehouse scale footer/open overhead on millions of
    * tiny files dominates scan cost long before data volume does.
    * Row-content preserving (no ordering contract, like any table
    * rewrite).
    *
    * Crash story, honestly: the swap is TWO renames (table → backup,
    * staging → table), and a filesystem rename pair is not atomic — a
    * crash between them leaves no live directory at `dir`, with the data
    * intact under `dir__precompact`. So on entry compact() RECOVERS that
    * state first: if the backup exists and `dir` does not, the backup is
    * restored (never deleted) before anything else happens, which makes
    * the crash window self-healing on rerun rather than data-losing. A
    * true transactional swap needs a format with a commit log (Delta/
    * Iceberg) or a single-rename layout; on object stores "rename" is
    * copy+delete, widening the window — run compaction there only under
    * a table lock or a manifest-pointer layout. Readers concurrent with
    * the swap can observe `dir` briefly absent; that, too, is a
    * table-format problem, not one two renames can solve.
    *
    * Operates on ONE leaf directory — for a date-partitioned table run it
    * per partition (compaction is embarrassingly parallel across
    * partitions, and per-partition swaps keep readers of other partitions
    * untouched). Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(dir + "__precompact")
    // crash recovery: a previous run that died between its two swap
    // renames left the table under the backup name — restore, don't drop
    if (fs.exists(bak) && !fs.exists(path)) fs.rename(bak, path)
    def parquetFiles() = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val staging = new org.apache.hadoop.fs.Path(dir + "__compacting")
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    // the backup slot must be free for THIS run's swap; at this point the
    // live table exists (recovered above if needed), so a leftover backup
    // is a stale artifact of a completed-or-recovered run, safe to drop
    fs.delete(bak, true)
    // Hadoop rename reports failure by RETURNING FALSE (missing source,
    // dest-parent race), not by throwing — an unchecked false on the
    // second rename followed by delete(bak) would destroy the only copy
    // of the table. Fail loudly instead, and only drop the backup once
    // the live table is confirmed back in place.
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compact: rename $path -> $bak failed")
    if (!fs.rename(staging, path)) {
      fs.rename(bak, path) // restore; staging is still intact for retry
      throw new java.io.IOException(
        s"compact: rename $staging -> $path failed; original restored")
    }
    if (fs.exists(path)) fs.delete(bak, true)
    (before.length, parquetFiles().length)
  }

  /** Declared query: the Z-curve key for events on (user_id low 16 bits,
    * hour-of-day) — the clustering key a 100 TB events table would be
    * laid out by so that both per-user and per-hour scans skip. Exact
    * integer output → DuckDB oracle recomputes the identical interleave. */
  val qLayoutZorder: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        hour(col("ts")).as("zy"))
      .withColumn("zkey", morton16("zx", "zy"))

  /** Zone-map (data-skipping index) construction over the Z-curve: rows
    * are grouped into 64-key curve segments (`zkey >> 6` — the stand-in
    * for a parquet row group under a zkey-sorted layout) and each zone
    * records count + min/max of BOTH clustered dimensions. This is the
    * index a 100 TB scan consults to skip blocks: because Morton
    * interleaving bounds each dimension's spread within a curve segment,
    * the per-zone min/max stay tight in x AND y (the measured 4/16 vs
    * 16/16 segment-touch gap in LayoutSpec is exactly this map's
    * selectivity). One map-side-combinable aggregate — a zone-map build
    * at any scale is a single corpus scan, and the map itself is
    * |zones| rows. Exact integer output → DuckDB oracle. */
  val qLayoutZonemap: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        pmod(col("user_id"), lit(65536L)).as("zx"),
        hour(col("ts")).as("zy"))
      .withColumn("zone", shiftright(morton16("zx", "zy"), 6))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_rows"),
        min(col("zx")).as("min_zx"), max(col("zx")).as("max_zx"),
        min(col("zy")).as("min_zy"), max(col("zy")).as("max_zy"))

  /** WebDataset-style shard packing of media payloads: within each kind
    * namespace, payloads pack in doc_id order into ~16 KiB shards —
    * shard id = bytes-before `div` capacity, the one-pass deterministic
    * assignment an archive writer applies while streaming (items may
    * straddle a boundary; the NEXT item starts the next shard). Output
    * is the shard manifest: item count, byte total, id range — what a
    * training loader consumes to schedule reads.
    *
    * Scale shape: the running byte offset partitions by the shard
    * namespace (kind here; source/date in production), so each
    * namespace packs independently in parallel — no global ordered
    * window ever forms, and the manifest rollup is map-side
    * combinable. */
  val qMultimodalShard: Q = (s, d) => {
    val sized = graft.multimodal.MediaOps.mediaTable(s, d)
      .select(col("doc_id"), col("kind"),
        octet_length(col("media")).cast("long").as("bytes"))
    val w = Window.partitionBy("kind").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    sized
      .withColumn("cum_before", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .withColumn("shard", expr("cum_before div 16384"))
      .groupBy(col("kind"), col("shard"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("bytes")).as("bytes_total"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_layout_zorder" -> qLayoutZorder,
    "q_layout_zonemap" -> qLayoutZonemap,
    "q_multimodal_shard" -> qMultimodalShard)

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_shard" ->
      """WITH m AS (
           SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             strlen(text) AS bytes
           FROM documents),
         c AS (
           SELECT kind, doc_id, bytes,
             COALESCE(SUM(bytes) OVER (PARTITION BY kind ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
           FROM m)
         SELECT kind, CAST(cum_before // 16384 AS BIGINT) AS shard,
           COUNT(*) AS n_items, CAST(SUM(bytes) AS BIGINT) AS bytes_total,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         FROM c GROUP BY 1, 2""",
    "q_layout_zorder" ->
      """WITH t AS (
           SELECT event_id,
             -- sign-normalized like Spark's pmod (% is sign-preserving)
             ((user_id % 65536) + 65536) % 65536 AS zx,
             CAST(hour(ts) AS INT) AS zy
           FROM events)
         SELECT event_id, zx, zy,
           CAST(list_sum(list_transform(range(16), i ->
             (((zx >> i) & 1) << (2 * i))
             + (((CAST(zy AS BIGINT) >> i) & 1) << (2 * i + 1))))
             AS BIGINT) AS zkey
         FROM t ORDER BY event_id""",
    "q_layout_zonemap" ->
      """WITH t AS (
           SELECT event_id,
             ((user_id % 65536) + 65536) % 65536 AS zx,
             CAST(hour(ts) AS INT) AS zy
           FROM events),
         k AS (
           SELECT zx, zy,
             CAST(list_sum(list_transform(range(16), i ->
               (((zx >> i) & 1) << (2 * i))
               + (((CAST(zy AS BIGINT) >> i) & 1) << (2 * i + 1))))
               AS BIGINT) AS zkey
           FROM t)
         SELECT zkey >> 6 AS zone,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zx) AS BIGINT) AS min_zx,
           CAST(MAX(zx) AS BIGINT) AS max_zx,
           MIN(zy) AS min_zy, MAX(zy) AS max_zy
         FROM k GROUP BY zone ORDER BY zone""")
}
