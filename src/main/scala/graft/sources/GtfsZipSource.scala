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
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.LandingSchemas

/** DataSource V2 connector that reads a GTFS member table DIRECTLY out
  * of the feed's zip archive — `spark.read.format("gtfs")
  * .option("table", "stops").load("<feed.zip>[,feed2.zip...]")` — with
  * the declared landing schema ([[LandingSchemas.gtfs]]) and V2 column
  * pruning.
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
    new GtfsTable(schema, properties.get("table"))
}

private[sources] class GtfsTable(tableSchema: StructType, table: String)
    extends Table with SupportsRead {
  override def name(): String = s"gtfs.$table"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GtfsScanBuilder(tableSchema, table, GtfsZipSource.pathsOf(options))
}

private[sources] object GtfsZipSource {
  /** load(path) arrives as "paths" (a JSON array) or "path". */
  def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      // minimal JSON string-array parse: ["a","b"]
      js.trim.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
    }
    val single = Option(options.get("path")).map(Seq(_))
    multi.orElse(single).getOrElse(
      throw new IllegalArgumentException("gtfs source needs a load(path)"))
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

  def convert(raw: String, dt: DataType): Any =
    if (raw == null || raw.isEmpty) null
    else dt match {
      case StringType => UTF8String.fromString(raw)
      case IntegerType => raw.trim.toInt
      case LongType => raw.trim.toLong
      case DoubleType => raw.trim.toDouble
      case other => throw new IllegalArgumentException(
        s"unsupported GTFS column type $other")
    }
}

private[sources] class GtfsScanBuilder(full: StructType, table: String,
    paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // Catalyst hands back a subset of the full schema (possibly empty
    // for COUNT(*)-only scans) — parse only these
    required = requiredSchema
  override def build(): Scan = new GtfsScan(required, table, paths)
}

private[sources] class GtfsScan(required: StructType, table: String,
    paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => GtfsPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GtfsReaderFactory(required, table)
}

private[sources] case class GtfsPartition(path: String) extends InputPartition

private[sources] class GtfsReaderFactory(required: StructType, table: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GtfsPartitionReader(required, table,
      partition.asInstanceOf[GtfsPartition].path)
}

/** Streams `<table>.txt` out of one zip archive, converting only the
  * pruned column set; header order in the file is free (columns are
  * matched by name, missing columns read as null — GTFS optional-field
  * semantics). */
private[sources] class GtfsPartitionReader(required: StructType,
    table: String, path: String) extends PartitionReader[InternalRow] {

  private val zin: ZipInputStream = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, new Configuration())
    new ZipInputStream(fs.open(p))
  }
  private val reader = {
    val entryName = s"$table.txt"
    var found = false
    var e = zin.getNextEntry
    while (e != null && !found) {
      if (e.getName == entryName) found = true else e = zin.getNextEntry
    }
    require(found, s"$entryName not found in $path")
    new java.io.BufferedReader(
      new java.io.InputStreamReader(zin, java.nio.charset.StandardCharsets.UTF_8))
  }
  // header → the source column index of each required field (-1 = absent)
  private val colIdx: Array[Int] = {
    val header = Option(reader.readLine()).getOrElse(
      throw new IllegalStateException(s"$table.txt in $path is empty"))
    val names = GtfsZipSource.splitCsv(header.stripPrefix("﻿")).map(_.trim)
    required.fields.map(f => names.indexOf(f.name))
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && line.isEmpty) line = reader.readLine()
    if (line == null) { current = null; false }
    else {
      val cells = GtfsZipSource.splitCsv(line.stripSuffix("\r"))
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
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
