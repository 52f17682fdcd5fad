package graft.sources

import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.LandingSchemas

/** DataSource V2 connector that reads a GTFS member table DIRECTLY out
  * of the feed's zip archive — `spark.read.format("gtfs")
  * .option("table", "stops").load(feedZip, feed2Zip, ...)` — with
  * the declared landing schema ([[LandingSchemas.gtfs]]), V2 column
  * pruning, and conservative filter pushdown. Malformed numeric cells
  * read as NULL (permissive, like spark.read.csv's default) — a single
  * bad row in a third-party feed must not abort the scan.
  *
  * The reference pipeline unzips the feed and re-uploads each member
  * verbatim (dags/warsaw-gtfs.py:82-96) before anything can query it;
  * this connector removes that staging hop for exploratory reads — the
  * zip IS the table. Production landing still goes through
  * [[graft.pipeline.GtfsIngest]] (columnar parquet, partition pruning,
  * stats); the connector is the raw-feed escape hatch, exactly the role
  * `spark.read.csv` plays for loose files.
  *
  * Scale shape: one input partition per zip archive — a zip's central
  * directory makes entries independently seekable only from the END of
  * the file, and GTFS members are deflate streams, so a single member
  * cannot be split; parallelism comes from the number of daily feed
  * archives (the reference lands one per day — a year of feeds = 365
  * partitions). Column pruning happens at parse time: pruned-away
  * columns are never converted, and `SupportsPushDownRequiredColumns`
  * reports the narrow read schema to Catalyst (`.explain` shows
  * `ReadSchema` with only the selected columns). Executors open the
  * archive through the Hadoop FS API, so any defaultFS-reachable store
  * works without code change.
  */
class GtfsZipSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "gtfs"

  private def tableOf(options: CaseInsensitiveStringMap): String = {
    val t = options.get("table")
    require(t != null && LandingSchemas.gtfs.contains(t),
      s"option 'table' must be one of ${LandingSchemas.gtfs.keys.toSeq.sorted.mkString(", ")}")
    t
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LandingSchemas.gtfs(tableOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    // re-wrap: the raw properties map is case-SENSITIVE, unlike the
    // CaseInsensitiveStringMap inferSchema validated against — without
    // this an option("TABLE", ...) would pass validation then NPE here
    new GtfsTable(schema,
      tableOf(new CaseInsensitiveStringMap(properties)))
}

private[sources] class GtfsTable(tableSchema: StructType, table: String)
    extends Table with SupportsRead {
  override def name(): String = s"gtfs.$table"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GtfsScanBuilder(tableSchema, table, GtfsZipSource.pathsOf(options))
}

private[sources] object GtfsZipSource {
  /** load(path) arrives as "paths" (a JSON string array) or "path" (one
    * path, used verbatim — commas are legal path characters, so no
    * splitting happens here; pass several archives as separate load()
    * arguments). */
  def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map(parseJsonStringArray)
    val single = Option(options.get("path")).map(Seq(_))
    multi.orElse(single).getOrElse(
      throw new IllegalArgumentException("gtfs source needs a load(path)"))
  }

  /** Parse a JSON array of strings (the exact shape DataFrameReader
    * serializes multi-path load() into), honouring quoting and the
    * \" \\ \/ \n \t \r escapes — a path may contain commas or quotes. */
  def parseJsonStringArray(js: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val s = js.trim
    require(s.startsWith("[") && s.endsWith("]"), s"not a JSON array: $js")
    var i = 1
    while (i < s.length - 1) {
      s.charAt(i) match {
        case '"' =>
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (!closed) {
            s.charAt(i) match {
              case '\\' =>
                s.charAt(i + 1) match {
                  case 'n' => sb += '\n'
                  case 't' => sb += '\t'
                  case 'r' => sb += '\r'
                  case c => sb += c // \" \\ \/ and friends
                }
                i += 2
              case '"' => closed = true; i += 1
              case c => sb += c; i += 1
            }
          }
          out += sb.result()
        case _ => i += 1 // commas / whitespace between elements
      }
    }
    out.toSeq
  }

  /** RFC-4180-ish line split: quoted fields, doubled-quote escapes. */
  def splitCsv(line: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') { sb += '"'; i += 1 }
          else inQ = false
        } else sb += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.result(); sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    out += sb.result()
    out.toArray
  }

  /** Permissive cell conversion: empty or malformed values read as
    * NULL (one bad row in a third-party feed must not kill the scan —
    * the data-quality queries downstream are the place to count them). */
  def convert(raw: String, dt: DataType): Any =
    if (raw == null || raw.isEmpty) null
    else dt match {
      case StringType => UTF8String.fromString(raw)
      case IntegerType =>
        try raw.trim.toInt catch { case _: NumberFormatException => null }
      case LongType =>
        try raw.trim.toLong catch { case _: NumberFormatException => null }
      case DoubleType =>
        try raw.trim.toDouble catch { case _: NumberFormatException => null }
      case other => throw new IllegalArgumentException(
        s"unsupported GTFS column type $other")
    }
}

private[sources] class GtfsScanBuilder(full: StructType, table: String,
    paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of the full schema (possibly empty
    // for COUNT(*)-only scans) — parse only these
    required = requiredSchema
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Apply the simple single-column comparisons inside the parse loop
    // (rows failing them never leave the reader) but ALSO hand every
    // filter back as residual: Spark re-checks them post-scan, so the
    // pushdown is purely an I/O/alloc saver and can never change
    // results — the conservative contract for a line-format source.
    pushed = filters.filter(GtfsFilterEval.supported(full, _))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new GtfsScan(required, table, paths, pushed)
}

/** Row-level evaluation of the pushable filter subset against the FULL
  * table schema (a filter may reference a column that was pruned from
  * the output — the reader parses such columns only for the test). */
private[sources] object GtfsFilterEval {
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _) => schema.fieldNames.contains(a)
    case GreaterThan(a, _) => schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case LessThan(a, _) => schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case StringStartsWith(a, _) => schema.fieldNames.contains(a)
    case _ => false
  }

  private def cmp(v: Any, lit: Any): Option[Int] = (v, lit) match {
    case (null, _) => None
    // UTF8String.compareTo is UTF-8 BINARY order — Spark's StringType
    // ordering. java.lang.String.compareTo would be UTF-16 code-unit
    // order, which disagrees above the BMP and would silently drop rows
    // the residual filter can never restore.
    case (a: UTF8String, b: String) => Some(a.compareTo(UTF8String.fromString(b)))
    case (a: Int, b: Int) => Some(java.lang.Integer.compare(a, b))
    case (a: Long, b: Long) => Some(java.lang.Long.compare(a, b))
    case (a: Double, b: Double) => Some(java.lang.Double.compare(a, b))
    case (a: Int, b: Number) => Some(java.lang.Double.compare(a.toDouble, b.doubleValue()))
    case (a: Long, b: Number) => Some(java.lang.Double.compare(a.toDouble, b.doubleValue()))
    case (a: Double, b: Number) => Some(java.lang.Double.compare(a, b.doubleValue()))
    case _ => None
  }

  /** True iff the row MAY pass (unknown comparisons keep the row —
    * Spark's residual check is authoritative). */
  def eval(f: Filter, value: String => Any): Boolean = f match {
    case EqualTo(a, l) => cmp(value(a), l).forall(_ == 0)
    case GreaterThan(a, l) => cmp(value(a), l).forall(_ > 0)
    case GreaterThanOrEqual(a, l) => cmp(value(a), l).forall(_ >= 0)
    case LessThan(a, l) => cmp(value(a), l).forall(_ < 0)
    case LessThanOrEqual(a, l) => cmp(value(a), l).forall(_ <= 0)
    case IsNotNull(a) => value(a) != null
    case StringStartsWith(a, p) => value(a) match {
      case s: UTF8String => s.toString.startsWith(p)
      case null => false
      case _ => true
    }
    case _ => true
  }
}

private[sources] class GtfsScan(required: StructType, table: String,
    paths: Seq[String], pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => GtfsPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    // capture the SESSION's Hadoop configuration on the driver — a bare
    // `new Configuration()` on the executor would drop spark.hadoop.*
    // settings (object-store credentials, custom FS impls) and break
    // the any-defaultFS-store contract
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val confMap = {
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    new GtfsReaderFactory(required, table, pushed, confMap)
  }
  override def description(): String =
    s"gtfs.$table PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(paths.length == 1,
      "streaming gtfs reads watch ONE directory of feed archives")
    new GtfsMicroBatchStream(required, table, paths.head, pushed,
      confCapture())
  }

  private def confCapture(): Map[String, String] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }
}

/** Micro-batch streaming over a DIRECTORY of feed archives — the
  * reference's daily-zip cadence as a stream: every archive that
  * appears becomes part of the next micro-batch, exactly once. The
  * offset is the sorted list of archive paths seen (monotone because
  * feeds are append-only; a restarted query replans precisely the
  * archives between the committed and latest offsets). One partition
  * per NEW archive — identical read path to the batch scan. */
private[sources] class GtfsMicroBatchStream(required: StructType,
    table: String, dir: String, pushed: Array[Filter],
    confMap: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def listArchives(): Seq[String] = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(dir)
    val fs = FileSystem.get(p.toUri, conf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".zip"))
      .map(_.getPath.toString).sorted
  }

  override def latestOffset(): Offset = GtfsOffset(listArchives())
  override def initialOffset(): Offset = GtfsOffset(Seq.empty)
  override def deserializeOffset(json: String): Offset =
    GtfsOffset(GtfsZipSource.parseJsonStringArray(json))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GtfsOffset].files.toSet
    end.asInstanceOf[GtfsOffset].files
      .filterNot(seen)
      .map(p => GtfsPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GtfsReaderFactory(required, table, pushed, confMap)
}

private[sources] case class GtfsOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") +
      "\"").mkString("[", ",", "]")
}

private[sources] case class GtfsPartition(path: String) extends InputPartition

private[sources] class GtfsReaderFactory(required: StructType, table: String,
    pushed: Array[Filter], confMap: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GtfsPartitionReader(required, table,
      partition.asInstanceOf[GtfsPartition].path, pushed, confMap)
}

/** Streams `<table>.txt` out of one zip archive, converting only the
  * pruned column set; header order in the file is free (columns are
  * matched by name, missing columns read as null — GTFS optional-field
  * semantics). */
private[sources] class GtfsPartitionReader(required: StructType,
    table: String, path: String, pushed: Array[Filter],
    confMap: Map[String, String]) extends PartitionReader[InternalRow] {

  private val fullSchema = LandingSchemas.gtfs(table)

  private val zin: ZipInputStream = {
    val conf = new Configuration(false)
    confMap.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    new ZipInputStream(fs.open(p))
  }
  private val reader =
    // close the stream if init fails (missing member / empty file) —
    // Spark only close()es readers whose construction succeeded
    try {
      val entryName = s"$table.txt"
      var found = false
      var e = zin.getNextEntry
      while (e != null && !found) {
        if (e.getName == entryName) found = true else e = zin.getNextEntry
      }
      require(found, s"$entryName not found in $path")
      new java.io.BufferedReader(
        new java.io.InputStreamReader(zin, java.nio.charset.StandardCharsets.UTF_8))
    } catch { case t: Throwable =>
      try zin.close() catch { case _: Throwable => () }
      throw t
    }
  // header → the source column index of each required field (-1 = absent)
  private val headerNames: Array[String] =
    try {
      val header = Option(reader.readLine()).getOrElse(
        throw new IllegalStateException(s"$table.txt in $path is empty"))
      GtfsZipSource.splitCsv(header.stripPrefix("﻿")).map(_.trim)
    } catch { case t: Throwable =>
      try reader.close() catch { case _: Throwable => () }
      throw t
    }
  private val colIdx: Array[Int] =
    required.fields.map(f => headerNames.indexOf(f.name))
  // filter-referenced columns resolve against the FULL schema (they may
  // be pruned from the output)
  private val filterCols: Map[String, (Int, DataType)] =
    pushed.flatMap(_.references).distinct.flatMap { name =>
      fullSchema.fields.find(_.name == name).map { f =>
        name -> ((headerNames.indexOf(name), f.dataType))
      }
    }.toMap

  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    while (line != null) {
      val cells = GtfsZipSource.splitCsv(line.stripSuffix("\r"))
      def valueOf(name: String): Any = filterCols.get(name) match {
        case Some((src, dt)) if src >= 0 && src < cells.length =>
          GtfsZipSource.convert(cells(src), dt)
        case _ => null
      }
      if (pushed.forall(GtfsFilterEval.eval(_, valueOf))) {
        val values = new Array[Any](required.length)
        var i = 0
        while (i < required.length) {
          val src = colIdx(i)
          values(i) =
            if (src < 0 || src >= cells.length) null
            else GtfsZipSource.convert(cells(src), required.fields(i).dataType)
          i += 1
        }
        current = new GenericInternalRow(values)
        return true
      }
      line = reader.readLine()
      while (line != null && line.isEmpty) line = reader.readLine()
    }
    current = null
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
