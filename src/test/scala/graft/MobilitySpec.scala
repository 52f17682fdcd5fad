package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.time.LocalDate
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** Consumer queries over a landed GTFS + delays warehouse (the VERDICT
  * r8 "GTFS consumer-query hole"): delay-per-route, stop headways,
  * calendar-exception service expansion — each asserted EXACTLY over a
  * warehouse landed through the real ingest path (GtfsIngest zip
  * expansion + DelaysIngest typed parse), not hand-built frames. */
class MobilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeZip(path: String, members: Map[String, String]): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(path))
    members.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
  }

  /** Lands a 2-route / 3-trip / 2-stop schedule plus two hourly delay
    * snapshots; returns the warehouse dir. */
  private def landWarehouse(): String = {
    val dir = Files.createTempDirectory("graft-mobility").toString
    val zip = s"$dir/warsaw.zip"
    writeZip(zip, Map(
      "routes.txt" ->
        ("route_id,agency_id,route_short_name,route_long_name,route_type\n" +
          "R175,A1,175,Airport Express,3\n" +
          "R17,A1,17,Loop Line,0\n"),
      "trips.txt" ->
        ("route_id,service_id,trip_id,trip_headsign\n" +
          "R175,WD,T1,Airport\n" +
          "R175,WD,T2,Airport\n" +
          "R17,WE,T3,Loop\n"),
      "stop_times.txt" ->
        ("trip_id,arrival_time,departure_time,stop_id,stop_sequence\n" +
          "T1,08:00:00,08:01:00,S1,1\n" +
          "T1,08:10:00,08:11:00,S2,2\n" +
          "T2,08:15:00,08:16:00,S1,1\n" +
          "T2,08:25:00,08:26:00,S2,2\n" +
          "T3,24:50:00,25:10:00,S1,1\n"), // GTFS times legally pass 24h
      "calendar_dates.txt" ->
        ("service_id,date,exception_type\n" +
          "WD,20241223,1\n" +
          "WD,20241224,1\n" +
          "WD,20241224,2\n" + // added then removed → inactive
          "WE,20241224,1\n"),
      "shapes.txt" ->
        ("shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\n" +
          "SH1,52.0,21.0,1\n" +
          "SH1,52.0,21.1,2\n" +   // ~6.85 km east along 52°N
          "SH1,52.1,21.1,3\n" +   // ~11.12 km north
          "SH2,52.5,21.0,1\n"),   // single point → zero length
      "stops.txt" ->
        "stop_id,stop_name,stop_lat,stop_lon\nS1,Centrum,52.23,21.01\nS2,Rondo,52.28,21.00\n"))
    assert(GtfsIngest.run(spark, zip, dir, s"$dir/state.parquet",
      LocalDate.of(2024, 12, 23)))

    def snapshot(path: String, rows: String): Unit =
      Files.writeString(java.nio.file.Paths.get(path),
        "type,vehicle_no,brigade,route,trip_headsign,delay_raw,stop_name,outside,ingest_ts\n"
          + rows)
    snapshot(s"$dir/delays-14.csv",
      "bus,1001,B1,175,Airport,5 min,Centrum,false,2024-12-23 14:00:00\n" +
        "bus,1002,B2,175,Airport,90 s,Centrum,false,2024-12-23 14:00:00\n" +
        "tram,2002,B3,17,Loop,120 s,Rondo,true,2024-12-23 14:00:00\n")
    snapshot(s"$dir/delays-15.csv",
      "bus,1001,B1,175,Airport,2 min,Centrum,false,2024-12-23 15:00:00\n" +
        "bus,9999,B9,999,Ghost,60 s,Nowhere,false,2024-12-23 15:00:00\n")
    DelaysIngest.run(spark, s"$dir/delays-14.csv", dir,
      LocalDate.of(2024, 12, 23), 14)
    DelaysIngest.run(spark, s"$dir/delays-15.csv", dir,
      LocalDate.of(2024, 12, 23), 15)
    dir
  }

  private lazy val wh = landWarehouse()

  test("delayByRoute: schedule-joined rollup, ghost routes survive") {
    val out = Mobility.delayByRoute(
      Mobility.delays(spark, wh),
      Mobility.gtfsTable(spark, wh, "routes"))
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        r.getLong(3), r.getLong(4), r.getInt(5), r.getLong(6)))
      .toSet
    // 175: 300 + 90 + 120 = 510 s over 3 obs → mean 1700 ds
    assert(out == Set(
      ("175", Some("Airport Express"), 3, 3L, 510L, 300, 1700L),
      ("17", Some("Loop Line"), 0, 1L, 120L, 120, 1200L),
      ("999", None, -1, 1L, 60L, 60, 600L))) // scraped but unscheduled
  }

  test("stopHeadways: per (stop, service) gaps, >24h times exact") {
    val out = Mobility.stopHeadways(
      Mobility.gtfsTable(spark, wh, "stop_times"),
      Mobility.gtfsTable(spark, wh, "trips"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getInt(5)))
      .toSet
    // Only consecutive pairs within a (stop, service): S1/WD T1→T2 and
    // S2/WD T1→T2 (both 900 s); T3 is the sole WE departure → no row.
    assert(out == Set(
      ("S1", "WD", "T2", "R175", 29760, 900),
      ("S2", "WD", "T2", "R175", 30360, 900)))
    // and the >24h literal parsed without wrapping: 25:10:00 = 90600
    val t3 = Mobility.gtfsTable(spark, wh, "stop_times")
      .filter(org.apache.spark.sql.functions.col("trip_id") === "T3")
      .select(Mobility.gtfsTimeSeconds(
        org.apache.spark.sql.functions.col("departure_time")))
      .head().getInt(0)
    assert(t3 == 90600)
  }

  test("service expansion: exception-aware active set and trips/day") {
    val active = Mobility.activeServices(
      Mobility.gtfsTable(spark, wh, "calendar_dates"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    // WD on 12-24 was added AND removed → inactive that day
    assert(active == Set(("WD", "2024-12-23"), ("WE", "2024-12-24")))

    val perDay = Mobility.tripsPerDay(
      Mobility.gtfsTable(spark, wh, "calendar_dates"),
      Mobility.gtfsTable(spark, wh, "trips"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(perDay == Set(
      ("2024-12-23", "R175", 2L, 1L),
      ("2024-12-24", "R17", 1L, 1L)))
  }

  test("shapeLengths: haversine polyline sums per shape") {
    val out = Mobility.shapeLengths(
      Mobility.gtfsTable(spark, wh, "shapes"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))).toMap
    def m(lat1: Double, lon1: Double, lat2: Double, lon2: Double) = {
      val R = graft.operators.Geo.EarthRadiusM
      val sLat = math.sin(math.toRadians(lat2 - lat1) / 2)
      val sLon = math.sin(math.toRadians(lon2 - lon1) / 2)
      val a = sLat * sLat + math.cos(math.toRadians(lat1)) *
        math.cos(math.toRadians(lat2)) * sLon * sLon
      2 * R * math.asin(math.min(1.0, math.sqrt(a)))
    }
    val want1 = m(52.0, 21.0, 52.0, 21.1) + m(52.0, 21.1, 52.1, 21.1)
    val (n1, len1) = out("SH1")
    assert(n1 == 3L)
    assert(math.abs(len1 - want1) < 1e-6, s"len=$len1 want=$want1")
    assert(len1 > 17000 && len1 < 19000) // ~6.85 + ~11.12 km
    val (n2, len2) = out("SH2")
    assert(n2 == 1L && len2 == -1.0) // single point: SUM of no segments = NULL
  }

  test("duplicate rider-facing keys (shared short name / stop name) " +
      "do not fan out observations") {
    import spark.implicits._
    // two agencies both run a "175" — legal per GTFS; the dim collapses
    // to the min-route_id representative and counts stay exact
    val obs = Seq(("175", 100), ("175", 50)).toDF("route", "delay_seconds")
    val routes = Seq(
      ("R2", "A2", "175", "Agency Two Express", 0),
      ("R1", "A1", "175", "Agency One Express", 3))
      .toDF("route_id", "agency_id", "route_short_name",
        "route_long_name", "route_type")
    val byRoute = Mobility.delayByRoute(obs, routes).collect()
    assert(byRoute.length == 1)
    assert(byRoute(0).getLong(3) == 2L) // n_obs NOT doubled by the dup dim
    assert(byRoute(0).getString(1) == "Agency One Express") // min route_id
    // one named interchange = many platforms (stop_ids)
    val sObs = Seq(("Centrum", 100)).toDF("stop_name", "delay_seconds")
    val stops = Seq(("S9", "Centrum"), ("S2", "Centrum"))
      .toDF("stop_id", "stop_name")
    val worst = Mobility.worstStops(sObs, stops, k = 5).collect()
    assert(worst.length == 1 && worst(0).getLong(2) == 1L &&
      worst(0).getString(1) == "S2")
  }

  test("worstStops: stop-name join, deci-second means, top-k order") {
    val out = Mobility.worstStops(
      Mobility.delays(spark, wh),
      Mobility.gtfsTable(spark, wh, "stops"), k = 10)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // Centrum: 300 + 90 (h14) + 120 (h15) = 510 s over 3 obs → 1700 ds;
    // Rondo: 120 → 1200 ds; Nowhere: 60 → 600 ds, no stop match → NULL id
    assert(out.toList == List(
      ("Centrum", Some("S1"), 3L, 510L, 1700L),
      ("Rondo", Some("S2"), 1L, 120L, 1200L),
      ("Nowhere", None, 1L, 60L, 600L)))
  }

  test("streaming delay rollup over the landed warehouse equals batch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val q = Mobility.delayRollupStream(Mobility.streamDelays(spark, wh))
      .writeStream.format("memory").queryName("mob_delay_roll")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("mob_delay_roll").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = Mobility.delays(spark, wh)
      .groupBy(window(col("ingest_ts"), "1 hour"), col("route"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("delay_seconds").cast("long")).as("total_delay_s"))
      .select(col("window.start"), col("route"), col("n_obs"),
        col("total_delay_s"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
    // the two landed snapshots arrive as separate micro-batches
    // (maxFilesPerTrigger=1) and still roll up exactly
    assert(got.map(_._2) == Set("175", "17", "999"))
  }

  test("deadRoutes: routes with no active service day are flagged") {
    // both fixture routes have active days; a ghost route with no trips
    // at all must appear dead
    val routes = Mobility.gtfsTable(spark, wh, "routes")
    val extra = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("R999", "A1", "999", "Phantom", 3)),
      pipeline.LandingSchemas.gtfs("routes"))
    val dead = Mobility.deadRoutes(
      routes.drop("y", "m", "d").unionByName(extra),
      Mobility.gtfsTable(spark, wh, "trips"),
      Mobility.gtfsTable(spark, wh, "calendar_dates"))
      .collect().map(_.getString(0)).toSet
    assert(dead == Set("R999"))
    // drop every calendar date → every route goes dead
    val none = Mobility.deadRoutes(routes,
      Mobility.gtfsTable(spark, wh, "trips"),
      Mobility.gtfsTable(spark, wh, "calendar_dates").limit(0))
      .collect().map(_.getString(0)).toSet
    assert(none == Set("R175", "R17"))
  }
}
