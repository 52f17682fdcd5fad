package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The GTFS zip DataSource V2 connector: schema-by-name parsing, quoted
  * CSV fields, V2 column pruning, multi-archive partitioning. */
class GtfsSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeZip(path: String, members: Map[String, String]): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(path))
    members.foreach { case (name, body) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(body.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
  }

  private def freshZip(members: Map[String, String]): String = {
    val dir = Files.createTempDirectory("gtfs-src").toString
    val zip = s"$dir/feed.zip"
    writeZip(zip, members)
    zip
  }

  test("reads a member table with types, quoted fields, free column order") {
    // header order differs from the declared schema; one quoted field
    // with an embedded comma and a doubled-quote escape
    val zip = freshZip(Map(
      "stops.txt" ->
        ("stop_lon,stop_id,stop_name,stop_lat\n" +
          "21.01,S1,\"Plac, Centralny \"\"A\"\"\",52.23\n" +
          "21.02,S2,North,52.25\n"),
      "routes.txt" -> "route_id,agency_id,route_short_name,route_long_name,route_type\nR1,A1,10,Line Ten,0\n"))
    val df = spark.read.format("gtfs").option("table", "stops").load(zip)
    assert(df.schema == graft.pipeline.LandingSchemas.gtfs("stops"))
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSet == Set(
      ("S1", "Plac, Centralny \"A\"", 52.23, 21.01),
      ("S2", "North", 52.25, 21.02)))
  }

  test("missing optional columns read as null (GTFS optional fields)") {
    val zip = freshZip(Map(
      "trips.txt" -> "route_id,service_id,trip_id\nR1,SVC,T1\n"))
    val row = spark.read.format("gtfs").option("table", "trips").load(zip)
      .collect().head
    assert(row.getString(2) == "T1" && row.isNullAt(3)) // no trip_headsign
  }

  test("column pruning reaches the scan: only selected columns parsed") {
    val zip = freshZip(Map(
      "stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nS1,North,52.0,21.0\n"))
    val df = spark.read.format("gtfs").option("table", "stops").load(zip)
      .select("stop_id")
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.output.map(_.name) == Seq("stop_id"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("S1"))
  }

  test("multiple archives become independent partitions, unioned") {
    val z1 = freshZip(Map(
      "stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nS1,A,1.0,2.0\n"))
    val z2 = freshZip(Map(
      "stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nS2,B,3.0,4.0\n"))
    val df = spark.read.format("gtfs").option("table", "stops").load(z1, z2)
    assert(df.rdd.getNumPartitions == 2)
    assert(df.select("stop_id").collect().map(_.getString(0)).toSet ==
      Set("S1", "S2"))
  }

  test("unknown table option fails fast with the valid set") {
    val zip = freshZip(Map("stops.txt" -> "stop_id\nS1\n"))
    val e = intercept[Exception] {
      spark.read.format("gtfs").option("table", "nope").load(zip).collect()
    }
    assert(e.getMessage.contains("stop_times"))
  }

  test("filter pushdown: filters reach the scan and results stay exact") {
    val zip = freshZip(Map(
      "stops.txt" -> ("stop_id,stop_name,stop_lat,stop_lon\n" +
        "S1,North,52.30,21.0\nS2,South,52.10,21.1\nS3,Mid,52.20,21.2\n")))
    val df = spark.read.format("gtfs").option("table", "stops").load(zip)
      .filter(col("stop_lat") > 52.15)
      .select("stop_id") // stop_lat pruned from output, still filterable
    assert(df.collect().map(_.getString(0)).toSet == Set("S1", "S3"))
    val scan = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }.head
    assert(scan.scan.description().contains("GreaterThan(stop_lat"))
    // equality + prefix filters, same exactness contract
    val df2 = spark.read.format("gtfs").option("table", "stops").load(zip)
      .filter(col("stop_name").startsWith("S") && col("stop_id") === "S2")
    assert(df2.collect().map(_.getString(0)).toSeq == Seq("S2"))
  }

  test("streaming: each new archive is consumed exactly once across restarts") {
    val dir = Files.createTempDirectory("gtfs-stream").toString
    val ckpt = s"$dir/_ckpt"
    writeZip(s"$dir/feed1.zip",
      Map("stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nS1,A,1.0,2.0\n"))
    val out = s"$dir/_out"
    def runOnce(): Seq[String] = {
      val q = spark.readStream.format("gtfs").option("table", "stops")
        .load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.read.parquet(out).select("stop_id").collect()
        .map(_.getString(0)).toSeq.sorted
    }
    assert(runOnce() == Seq("S1"))
    // a second archive lands; the restarted query (same checkpoint)
    // processes ONLY the new one — the committed offset carries the
    // already-seen archive list, so the sink ends append-exact
    writeZip(s"$dir/feed2.zip",
      Map("stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nS2,B,3.0,4.0\n"))
    assert(runOnce() == Seq("S1", "S2"))
    // nothing new: an empty micro-batch, not a reprocess (no dup rows)
    assert(runOnce() == Seq("S1", "S2"))
  }

  test("source agrees with the landed-parquet ingest path row-for-row") {
    val stopsCsv = "stop_id,stop_name,stop_lat,stop_lon\n" +
      "S1,North,52.25,21.0\nS2,\"South, Gate\",52.15,21.05\n"
    val zip = freshZip(Map("stops.txt" -> stopsCsv))
    val viaSource = spark.read.format("gtfs").option("table", "stops")
      .load(zip).collect().map(_.toSeq).toSet
    // the landing path: expand + schema'd CSV read (what GtfsIngest does)
    val dir = Files.createTempDirectory("gtfs-land").toString
    val csv = s"$dir/stops.csv"
    Files.writeString(java.nio.file.Paths.get(csv), stopsCsv)
    val viaLanding = spark.read
      .schema(graft.pipeline.LandingSchemas.gtfs("stops"))
      .option("header", "true").csv(csv)
      .collect().map(_.toSeq).toSet
    assert(viaSource == viaLanding)
  }
}
