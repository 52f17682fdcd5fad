package graft.sources

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for WebDataset-style tar shards —
  * `spark.read.format("wds").load(dirOrShard, ...)` — the de-facto
  * packing format for multimodal training corpora (sample =
  * same-basename member group: `000123.jpg` + `000123.json` +
  * `000123.txt` share key `000123`). One row per tar member:
  *
  *   shard STRING, key STRING, ext STRING, data BINARY, size LONG
  *
  * Sample assembly is one `groupBy(shard, key)` +
  * `map_from_entries(collect_list(struct(ext, data)))` away — kept out
  * of the source so Catalyst sees the flat relation (pruning/filters
  * reach member grain). [[graft.operators.Layout]]'s
  * `q_multimodal_shard` plans the WRITE side (size-binned shard
  * manifest); this is the read side.
  *
  * Scale shape: one input partition per shard — tar has no central
  * directory, a stream must walk entry headers, and WebDataset's whole
  * design premise is that the SHARD is the unit of parallel, sequential
  * I/O (thousands of shards → thousands of partitions). Column pruning
  * is the big lever: a scan that doesn't select `data` never
  * materializes payload bytes (the reader skips entry bodies — metadata
  * listings over 100 TB of shards read only 512-byte headers), and
  * pruned scans report the narrow `ReadSchema` to Catalyst. Filter
  * pushdown is conservative-and-residual ([[GtfsZipSource]] contract):
  * `ext = 'jpg'` / `key LIKE 'prefix%'` skip non-matching members
  * before any byte of payload is read, and Spark re-checks everything
  * post-scan, so pushdown is purely an I/O saver. Executors open shards
  * through the Hadoop FS API (any defaultFS-reachable store).
  */
class TarShardSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "wds"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TarShardSource.schema

  // writes resolve against the incoming frame's schema (shard/key/ext/
  // data — no derived `size` column), reads against the inferred one
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TarShardTable(schema)
}

object TarShardSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("data", BinaryType, nullable = false),
    StructField("size", LongType, nullable = false)))

  /** WebDataset key split: basename before the FIRST dot is the sample
    * key, the remainder the extension (`a/b/000123.seg.json` →
    * key `a/b/000123`, ext `seg.json`). */
  def splitName(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  def expandPaths(paths: Seq[String], confMap: Map[String, String]): Seq[String] = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    paths.flatMap { raw =>
      val p = new Path(raw)
      val fs = FileSystem.get(p.toUri, conf)
      val st = fs.getFileStatus(p)
      if (st.isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".tar"))
          .map(_.getPath.toString).sorted
      else Seq(p.toString)
    }
  }

  def confCapture(): Map[String, String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }
}

private[sources] class TarShardTable(tableSchema: StructType) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = "wds"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(GtfsZipSource.pathsOf(options))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TarWriteBuilder(info)
}

private[sources] class TarScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = TarShardSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // accept the name-only subset (evaluable from the entry header,
    // before payload bytes); everything returns as residual — Spark
    // re-checks, so a pushdown bug can cost I/O, never correctness
    pushed = filters.filter {
      case EqualTo(a, _) => TarFilterEval.nameCols(a)
      case In(a, _) => TarFilterEval.nameCols(a)
      case StringStartsWith(a, _) => TarFilterEval.nameCols(a)
      case IsNotNull(a) => TarFilterEval.nameCols(a)
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new TarScan(required, paths, pushed)
}

private[sources] object TarFilterEval {
  val nameCols: Set[String] = Set("shard", "key", "ext")

  /** May the member with this (shard, key, ext) pass? Header-only. */
  def eval(f: Filter, shard: String, key: String, ext: String): Boolean = {
    def v(a: String): String = a match {
      case "shard" => shard
      case "key" => key
      case "ext" => ext
      case _ => null
    }
    f match {
      case EqualTo(a, lit: String) => v(a) == null || v(a) == lit
      case In(a, lits) => v(a) == null || lits.contains(v(a))
      case StringStartsWith(a, p) => v(a) == null || v(a).startsWith(p)
      case IsNotNull(a) => v(a) != null
      case _ => true
    }
  }
}

private[sources] class TarScan(required: StructType, paths: Seq[String],
    pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val confMap = TarShardSource.confCapture()
    TarShardSource.expandPaths(paths, confMap)
      .map(p => TarPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TarReaderFactory(required, pushed, TarShardSource.confCapture())

  override def description(): String =
    s"wds PushedFilters: ${pushed.mkString("[", ", ", "]")}"
}

private[sources] case class TarPartition(path: String) extends InputPartition

private[sources] class TarReaderFactory(required: StructType,
    pushed: Array[Filter], confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TarPartitionReader(required,
      partition.asInstanceOf[TarPartition].path, pushed, confMap)
}

/** Streams one shard: walks entry headers, applies the pushed
  * name-filters, and materializes payload bytes ONLY when the `data`
  * column is in the required schema. */
private[sources] class TarPartitionReader(required: StructType, path: String,
    pushed: Array[Filter], confMap: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val needData = required.fieldNames.contains("data")
  private val shardName = {
    val i = path.lastIndexOf('/')
    if (i < 0) path else path.substring(i + 1)
  }

  private val tin: TarArchiveInputStream = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    new TarArchiveInputStream(fs.open(p))
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var entry: TarArchiveEntry = tin.getNextEntry
    while (entry != null) {
      if (entry.isFile) {
        val (key, ext) = TarShardSource.splitName(entry.getName)
        if (pushed.forall(TarFilterEval.eval(_, shardName, key, ext))) {
          val size = entry.getSize
          val data =
            if (needData) {
              require(size <= Int.MaxValue,
                s"tar member ${entry.getName} exceeds 2 GiB — shard it " +
                  "smaller (WebDataset members are sample-sized)")
              val buf = new Array[Byte](size.toInt)
              var off = 0
              while (off < buf.length) {
                val n = tin.read(buf, off, buf.length - off)
                require(n >= 0, s"truncated tar entry ${entry.getName} in $path")
                off += n
              }
              buf
            } else null // body skipped by the next getNextEntry
          val row = new GenericInternalRow(required.length)
          required.fieldNames.zipWithIndex.foreach { case (f, i) =>
            f match {
              case "shard" => row.update(i, UTF8String.fromString(shardName))
              case "key" => row.update(i, UTF8String.fromString(key))
              case "ext" => row.update(i, UTF8String.fromString(ext))
              case "data" => row.update(i, data)
              case "size" => row.setLong(i, size)
            }
          }
          current = row
          return true
        }
      }
      entry = tin.getNextEntry
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = tin.close()
}

// ────────────────────────────── write side ──────────────────────────────

/** DataSource V2 WRITER for WebDataset tar shards — the sink half of the
  * `wds` round-trip:
  *
  *   df.select("shard", "key", "ext", "data")
  *     .write.format("wds").mode("append" | "overwrite").save(dir)
  *
  * One tar file per distinct `shard` value, one tar member per row
  * (`key.ext`), members of a sample contiguous — the exact layout the
  * read side and every WebDataset consumer expect. The sharding POLICY
  * (which sample goes to which shard, size binning) stays a query —
  * `q_multimodal_shard` plans the manifest; this sink materializes it.
  *
  * Scale shape — the writer DECLARES its locality instead of trusting
  * callers: [[RequiresDistributionAndOrdering]] asks Catalyst to cluster
  * incoming rows by `shard` and sort by (shard, key), so Spark plans the
  * one exchange that makes "shard = unit of sequential I/O" true and
  * each task streams whole tars with no writer-side buffering beyond a
  * single member. Clustered distribution puts each shard in exactly one
  * task — no cross-task append coordination exists, matching tar's
  * append-only format.
  *
  * Commit protocol (task-idempotent): tasks write to
  * `<dir>/_staging_<queryId>/<taskId>_<attempt>_<shard>`, the driver's
  * [[BatchWrite.commit]] renames winners into place (after deleting
  * pre-existing `*.tar` when `mode=overwrite` → truncate) and removes
  * the staging dir; abort deletes staging, leaving the target untouched.
  * Append-mode collision contract: a shard name that already exists in
  * the target directory FAILS the batch before any rename — append adds
  * shards, it never replaces committed ones; only overwrite rewrites.
  * A zombie attempt's files are never renamed — the commit-coordinated
  * winner's message is the only one the driver sees.
  */
private[sources] class TarWriteBuilder(info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val s = info.schema()
    val need = Seq("shard" -> StringType, "key" -> StringType,
      "ext" -> StringType, "data" -> BinaryType)
    need.foreach { case (n, t) =>
      val f = s.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"wds write needs column `$n` — got ${s.fieldNames.mkString(", ")}"))
      require(f.dataType == t, s"wds write column `$n` must be $t, got ${f.dataType}")
    }
    val dir = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException("wds write needs a path"))
    new TarWrite(dir, s, info.queryId(), doTruncate)
  }
}

private[sources] class TarWrite(dir: String, schema: StructType,
    queryId: String, doTruncate: Boolean)
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.identity("shard")))

  override def requiredOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.identity("shard"), SortDirection.ASCENDING),
    Expressions.sort(Expressions.identity("key"), SortDirection.ASCENDING))

  override def toBatch: BatchWrite = new TarBatchWrite(
    dir, schema, queryId, doTruncate, TarShardSource.confCapture())
}

private[sources] case class TarTaskCommit(renames: Seq[(String, String)])
    extends WriterCommitMessage

private[sources] class TarBatchWrite(dir: String, schema: StructType,
    queryId: String, doTruncate: Boolean, confMap: Map[String, String])
    extends BatchWrite {

  private def fs(conf: Configuration): FileSystem =
    FileSystem.get(new Path(dir).toUri, conf)

  private def conf(): Configuration = {
    val c = new Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }

  private def stagingDir: Path = new Path(dir, s"_staging_$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new TarWriterFactory(dir, stagingDir.toString, schema, confMap)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val c = conf()
    val f = fs(c)
    val target = new Path(dir)
    f.mkdirs(target)
    if (doTruncate)
      f.listStatus(target).filter(s =>
        s.isFile && s.getPath.getName.endsWith(".tar"))
        .foreach(s => f.delete(s.getPath, false))
    val renames = messages.flatMap {
      case TarTaskCommit(rs) => rs
      case _ => Seq.empty
    }
    val dup = renames.groupBy(_._2).filter(_._2.length > 1).keys
    require(dup.isEmpty,
      s"wds write: shard(s) ${dup.mkString(", ")} produced by more than " +
        "one task — clustered distribution violated")
    // Append never replaces committed data: a target-name collision in
    // append mode is an error (checked up front, before any rename, so
    // the batch fails atomically). Overwrite replaces by contract — the
    // truncate above already cleared *.tar, the per-rename delete only
    // covers a leftover from an interrupted previous commit.
    if (!doTruncate) {
      val clashes = renames.map(_._2)
        .filter(fin => f.exists(new Path(target, fin)))
      require(clashes.isEmpty,
        s"wds append: shard(s) ${clashes.mkString(", ")} already exist " +
          s"in $dir — append adds new shards only; use mode 'overwrite' " +
          "to replace, or emit batch-unique shard names")
    }
    renames.foreach { case (tmp, fin) =>
      val dst = new Path(target, fin)
      if (doTruncate && f.exists(dst)) f.delete(dst, false)
      require(f.rename(new Path(tmp), dst),
        s"wds write: rename $tmp -> $dst failed")
    }
    f.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val f = fs(conf())
    f.delete(stagingDir, true)
  }
}

private[sources] class TarWriterFactory(dir: String, staging: String,
    schema: StructType, confMap: Map[String, String])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TarDataWriter(dir, staging, schema, confMap, partitionId, taskId)
}

/** Streams one task's clustered+sorted rows into tar shards, rolling the
  * output file whenever the `shard` value changes. */
private[sources] class TarDataWriter(dir: String, staging: String,
    schema: StructType, confMap: Map[String, String],
    partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {

  private val iShard = schema.fieldIndex("shard")
  private val iKey = schema.fieldIndex("key")
  private val iExt = schema.fieldIndex("ext")
  private val iData = schema.fieldIndex("data")

  private val conf = {
    val c = new Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val fs = FileSystem.get(new Path(dir).toUri, conf)

  private var currentShard: String = _
  private var out: TarArchiveOutputStream = _
  private val done = collection.mutable.LinkedHashSet[String]()
  private val renames = collection.mutable.ListBuffer[(String, String)]()

  private def shardFile(shard: String): String =
    if (shard.endsWith(".tar")) shard else shard + ".tar"

  private def roll(shard: String): Unit = {
    closeCurrent()
    require(!shard.contains('/') && shard.nonEmpty,
      s"wds write: shard name must be a bare file name, got '$shard'")
    require(!done.contains(shard),
      s"wds write: shard '$shard' re-appeared after its tar closed — " +
        "input was not sorted by (shard, key) within the task")
    done += shard
    val fin = shardFile(shard)
    val tmp = new Path(staging, s"${partitionId}_${taskId}_$fin")
    fs.mkdirs(new Path(staging))
    out = new TarArchiveOutputStream(fs.create(tmp, true))
    out.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
    renames += ((tmp.toString, fin))
    currentShard = shard
  }

  private def closeCurrent(): Unit =
    if (out != null) { out.finish(); out.close(); out = null }

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(iShard) || row.isNullAt(iKey) ||
        row.isNullAt(iExt) || row.isNullAt(iData)) {
      val nulls = Seq("shard" -> iShard, "key" -> iKey, "ext" -> iExt,
        "data" -> iData).collect { case (n, i) if row.isNullAt(i) => n }
      throw new IllegalArgumentException(
        s"wds write: null in required column(s) ${nulls.mkString(", ")} — " +
          "shard, key, ext and data must all be non-null")
    }
    val shard = row.getUTF8String(iShard).toString
    if (shard != currentShard || out == null) roll(shard)
    val key = row.getUTF8String(iKey).toString
    val ext = row.getUTF8String(iExt).toString
    val data = row.getBinary(iData)
    val name = if (ext.isEmpty) key else s"$key.$ext"
    val entry = new TarArchiveEntry(name)
    entry.setSize(data.length.toLong)
    out.putArchiveEntry(entry)
    out.write(data)
    out.closeArchiveEntry()
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    TarTaskCommit(renames.toList)
  }

  override def abort(): Unit = {
    // finish() throws on an unclosed entry — exactly the state a failed
    // write() leaves behind. Never let closing mask the staging cleanup.
    if (out != null) {
      try { out.finish(); out.close() } catch { case _: Throwable => () }
      out = null
    }
    renames.foreach { case (tmp, _) =>
      try fs.delete(new Path(tmp), false) catch { case _: Throwable => () }
    }
  }

  override def close(): Unit = closeCurrent()
}
