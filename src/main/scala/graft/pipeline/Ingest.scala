package graft.pipeline

import java.time.LocalDate
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ParseDelay

/** Batch ingestion jobs replacing the reference's three DAGs (SURVEY.md
  * §3.1–3.4). Network fetch (P1/P2) and Selenium scraping (P3) stay
  * outside the engine by design — these jobs start from landed files.
  */
object Ingest {

  /** P7: archive expansion, executor-side. binaryFile read → per-file
    * ZipInputStream flatMap — streams entries, never materializes the
    * archive on the driver; parallel over archives when given a glob. */
  def expandZip(spark: SparkSession, zipPath: String): Dataset[(String, Array[Byte])] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(zipPath)
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { bytes =>
        val zin = new ZipInputStream(new java.io.ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .map { e =>
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = zin.read(buf)
            while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
            (e.getName, out.toByteArray)
          }.toList
      }
  }

  /** P7+P8 landing without driver materialization: stream every zip
    * member from the executor-side expansion straight to `stagingDir` on
    * the warehouse filesystem. The driver only lists the staged names
    * afterwards (a metadata op) — member BYTES never cross the driver,
    * so archive size is bounded by executor memory per member, not by
    * driver heap. Returns the staged member names. */
  /** Zip entry names are REMOTE UNTRUSTED INPUT (a fetched feed
    * archive): a name containing a path separator or `..` could write
    * outside `stagingDir` (zip-slip) or into a subdirectory the
    * non-recursive listing below would never surface. A GTFS feed is a
    * flat archive of `<table>.txt`, so anything non-flat is rejected
    * loudly rather than sanitized into a guess. */
  private def requireFlatEntryName(name: String): Unit =
    require(name.nonEmpty && !name.contains('/') && !name.contains('\\')
        && name != "." && name != "..",
      s"stageZip: refusing non-flat zip entry name '$name' " +
        "(path traversal or nested layout)")

  def stageZip(spark: SparkSession, zipPath: String,
      stagingDir: String): Seq[String] = {
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    expandZip(spark, zipPath).foreachPartition {
      it: Iterator[(String, Array[Byte])] =>
        it.foreach { case (name, bytes) =>
          requireFlatEntryName(name)
          val p = new org.apache.hadoop.fs.Path(stagingDir, name)
          val fs = p.getFileSystem(serConf.value)
          val out = fs.create(p, true)
          try out.write(bytes) finally out.close()
        }
    }
    val dir = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.listStatus(dir).map(_.getPath.getName).toSeq
    else Seq.empty
  }

}

/** Reference blob-layout landing paths, zone-parameterized. The
  * reference computes its landing paths with wall-clock local time —
  * `delays` explicitly in Europe/Warsaw (dags/warsaw-delays.py:194-195),
  * `weather` in whatever zone the worker runs in
  * (dags/warsaw-weather.py:21) — while the engine pins UTC everywhere.
  * This helper reproduces the reference layout byte-for-byte when a
  * migration user asks for it: pass [[LandingPaths.Warsaw]] and the path
  * is the one the reference would have written, DST jumps included
  * (spring-forward skips an hour token; fall-back lands two snapshots on
  * one hour token — the reference's own collision, which its
  * exists/upload guards then hit). Default stays UTC. */
object LandingPaths {
  val Utc: java.time.ZoneId = java.time.ZoneId.of("UTC")
  val Warsaw: java.time.ZoneId = java.time.ZoneId.of("Europe/Warsaw")

  /** `YYYY/MM/DD/<prefix>-HH` for `ts` rendered in `zone` — the
    * reference's `strftime("%Y/%m/%d/<prefix>-%H")`. */
  def blobPath(prefix: String, ts: java.time.Instant,
      zone: java.time.ZoneId = Utc): String = {
    val z = ts.atZone(zone)
    f"${z.getYear}%04d/${z.getMonthValue}%02d/${z.getDayOfMonth}%02d/$prefix-${z.getHour}%02d"
  }

  /** dags/warsaw-delays.py:194: `traffic/YYYY/MM/DD/delays-HH.csv`. */
  def delaysCsv(ts: java.time.Instant,
      zone: java.time.ZoneId = Utc): String =
    s"traffic/${blobPath("delays", ts, zone)}.csv"

  /** dags/warsaw-weather.py:21: `weather/YYYY/MM/DD/weather-HH.csv`. */
  def weatherCsv(ts: java.time.Instant,
      zone: java.time.ZoneId = Utc): String =
    s"weather/${blobPath("weather", ts, zone)}.csv"

  /** (date, hour) of `ts` in `zone` — the partition key the zone-aware
    * ingest variants land under. */
  def datePartition(ts: java.time.Instant,
      zone: java.time.ZoneId): (LocalDate, Int) = {
    val z = ts.atZone(zone)
    (z.toLocalDate, z.getHour)
  }
}

/** DAG 1 — daily GTFS feed (dags/warsaw-gtfs.py). */
object GtfsIngest {

  /** P1 + the full DAG: fetch the feed zip to `stagingZip`, then [[run]].
    * The fetch is unconditional — the reference downloads BEFORE its
    * hash short-circuit (dags/warsaw-gtfs.py:49-58, the hash needs the
    * bytes); change detection is [[run]]'s job. Returns false when the
    * feed was unchanged and the run short-circuited. */
  def fetchAndRun(spark: SparkSession, url: String,
      stagingZip: java.nio.file.Path, warehouseDir: String,
      statePath: String, date: LocalDate): Boolean = {
    Fetch.toFile(url, stagingZip)
    run(spark, stagingZip.toString, warehouseDir, statePath, date)
  }

  /** Full run: hash → short-circuit if unchanged (P5) → expand (P7) →
    * per-table typed parse + date-partitioned parquet (P8/P9) → state
    * write LAST (ordering fix). Returns false when skipped. */
  def run(spark: SparkSession, zipPath: String, warehouseDir: String,
      statePath: String, date: LocalDate): Boolean = {
    val hash = FeedState.sha256OfFile(zipPath)
    if (!FeedState.changed(spark, statePath, "gtfs", hash)) return false

    // executor-side landing: member bytes go archive → staging files
    // without ever materializing on the driver (the round-2/3 shape
    // collected the whole archive into a driver Map)
    val staging = s"$warehouseDir/.staging/gtfs-$hash"
    val staged = Ingest.stageZip(spark, zipPath, staging).toSet
    // P8 fan-out over the table list: one read→write job per member; each
    // job is internally parallel, so sequential submission is fine
    LandingSchemas.gtfs.foreach { case (table, schema) =>
      if (staged.contains(s"$table.txt")) {
        val df = spark.read.schema(schema).option("header", "true")
          .csv(s"$staging/$table.txt")
        // zstd: ~2× smaller than snappy on text-heavy tables at similar
        // scan speed — at 100 TB the storage/IO win dominates
        df.write.mode(SaveMode.Overwrite).option("compression", "zstd").parquet(
          f"$warehouseDir/gtfs/$table/y=${date.getYear}%04d/m=${date.getMonthValue}%02d/d=${date.getDayOfMonth}%02d")
      }
    }
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    stagingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(stagingPath, true)
    FeedState.writeHash(spark, statePath, "gtfs", hash) // AFTER data commits
    true
  }
}

/** DAG 2 — hourly delays snapshot (dags/warsaw-delays.py). The engine
  * owns everything from the landed CSV onward; the XCom DataFrame hop
  * disappears into lazy lineage (SURVEY.md §3.2). */
object DelaysIngest {

  /** [[run]] with the partition key derived from an instant rendered in
    * `zone` (default UTC; pass [[LandingPaths.Warsaw]] to reproduce the
    * reference's Europe/Warsaw layout, dags/warsaw-delays.py:194-195). */
  def runAt(spark: SparkSession, csvPath: String, warehouseDir: String,
      ts: java.time.Instant,
      zone: java.time.ZoneId = LandingPaths.Utc): Unit = {
    val (date, hour) = LandingPaths.datePartition(ts, zone)
    run(spark, csvPath, warehouseDir, date, hour)
  }

  /** Landed CSV → typed parse (delay_raw → delay_seconds, the parse the
    * reference never does) → hour-partitioned parquet (P12/P13).
    *
    * Writes straight to THIS hour's Hive-layout leaf (like
    * [[WeatherIngest.target]]): `partitionBy` against the shared base
    * path would make `ErrorIfExists` test the BASE directory, so every
    * landing after the first throws — the P11 guard must scope to the
    * snapshot being landed, not the table. Readers of
    * `$warehouseDir/traffic` get y/m/d/h back via partition discovery
    * exactly as with partitionBy. */
  def run(spark: SparkSession, csvPath: String, warehouseDir: String,
      date: LocalDate, hour: Int): Unit = {
    val df = spark.read.schema(LandingSchemas.delays)
      .option("header", "true").csv(csvPath)
      .withColumn("delay_seconds", ParseDelay.parseDelay(col("delay_raw")))
      .withColumn("outside_flag", col("outside") === "true")
    // unpadded segment values — byte-identical to the layout partitionBy
    // wrote, so pre-existing landings and this path interleave in one table
    val leaf = s"$warehouseDir/traffic/y=${date.getYear}" +
      s"/m=${date.getMonthValue}/d=${date.getDayOfMonth}/h=$hour"
    df.write.mode(SaveMode.ErrorIfExists) // P11: non-overwriting landing
      .option("compression", "zstd")
      .parquet(leaf)
  }
}

/** DAG 3 — hourly weather snapshot (dags/warsaw-weather.py). */
object WeatherIngest {

  /** Hour-partition target for a snapshot (engine-native Hive layout). */
  def target(outDir: String, date: LocalDate, hour: Int): String =
    f"$outDir/weather/y=${date.getYear}%04d/m=${date.getMonthValue}%02d/d=${date.getDayOfMonth}%02d/h=$hour%02d"

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** P2 + P10, the full DAG: the exists short-circuit runs BEFORE the
    * API call (dags/warsaw-weather.py:26-34 — its whole point is not
    * hitting the API when this hour's snapshot already landed), then
    * fetch → land. Returns false when the snapshot existed and the API
    * was never touched. */
  def fetchAndRun(spark: SparkSession, url: String, outDir: String,
      date: LocalDate, hour: Int): Boolean =
    if (exists(spark, target(outDir, date, hour))) false
    else run(spark, Fetch.bytes(url), outDir, date, hour)

  /** [[run]] with the partition key derived from an instant rendered in
    * `zone` — default UTC; the reference lands in the worker's local
    * zone (dags/warsaw-weather.py:21). */
  def runAt(spark: SparkSession, payload: Array[Byte], outDir: String,
      ts: java.time.Instant,
      zone: java.time.ZoneId = LandingPaths.Utc): Boolean = {
    val (date, hour) = LandingPaths.datePartition(ts, zone)
    run(spark, payload, outDir, date, hour)
  }

  /** P10: idempotent write guard — SaveMode.Ignore is the exact semantic
    * match for "skip if blob exists" (dags/warsaw-weather.py:26-28).
    * Returns false when the target already existed. */
  def run(spark: SparkSession, payload: Array[Byte], outDir: String,
      date: LocalDate, hour: Int): Boolean = {
    val targetDir = target(outDir, date, hour)
    // Hadoop FS existence check so the returned did-write flag matches
    // SaveMode.Ignore's own decision on any filesystem, not just local
    val existed = exists(spark, targetDir)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(org.apache.spark.sql.Row(f"$hour%02d", payload)), 1),
      LandingSchemas.weather)
    df.write.mode(SaveMode.Ignore).parquet(targetDir)
    !existed
  }
}
