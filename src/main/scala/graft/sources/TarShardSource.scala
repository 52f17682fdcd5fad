package graft.sources

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TarShardTable
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

private[sources] class TarShardTable extends Table with SupportsRead {
  override def name(): String = "wds"
  override def schema(): StructType = TarShardSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(GtfsZipSource.pathsOf(options))
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
