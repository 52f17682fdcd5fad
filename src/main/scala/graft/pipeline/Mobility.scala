package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Consumer queries over the landed GTFS + delays warehouse — the
  * downstream analytics the reference's entire landing layout exists to
  * feed (`dags/warsaw-delays.py:194` lands the hourly delay snapshots;
  * `dags/warsaw-gtfs.py:30-39` keys the 8 GTFS tables they join
  * against). The reference itself stops at the landing zone; these are
  * the first three queries a mobility consumer runs on day one:
  * delay-per-route rollups, stop headways, and calendar-exception
  * service expansion.
  *
  * All three are typed over [[LandingSchemas]] (declared, never
  * inferred) and read the warehouse through partition discovery, so the
  * y/m/d (and traffic h) partition columns come back for free and date
  * predicates prune files before any scan.
  *
  * Scale shapes:
  *  - routes/trips/calendar_dates are SCHEDULE-sized dimensions (tens of
  *    thousands of rows for the largest city feeds, bounded by the
  *    transit network, not by observation volume) — they broadcast; the
  *    observation-sized sides (delays snapshots, stop_times) never
  *    shuffle for those joins.
  *  - the headway window partitions on (stop_id, service_id), whose
  *    group size is bounded by departures-per-stop-per-service — a
  *    schedule constant — so window state never grows with fleet size
  *    or history length.
  */
object Mobility {

  /** Declared-schema read of a landed GTFS member table; partition
    * discovery over the y/m/d layout [[GtfsIngest.run]] writes. */
  def gtfsTable(spark: SparkSession, warehouseDir: String,
      table: String): DataFrame =
    spark.read.schema(LandingSchemas.gtfs(table))
      .parquet(s"$warehouseDir/gtfs/$table")

  /** All landed delay snapshots (y/m/d/h discovered as partitions). */
  def delays(spark: SparkSession, warehouseDir: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/traffic")

  /** GTFS `HH:MM:SS` → seconds since service-day midnight. GTFS times
    * legally exceed 24:00:00 (a 25:10:00 departure belongs to the
    * PREVIOUS service day's timetable), so this must NOT go through a
    * timestamp type — plain field arithmetic keeps 25:10:00 = 90600. */
  def gtfsTimeSeconds(c: Column): Column = {
    val p = split(c, ":")
    (p.getItem(0).cast("int") * 3600 +
      p.getItem(1).cast("int") * 60 +
      p.getItem(2).cast("int"))
  }

  /** (a) Delay-per-route rollup: every landed delay observation joined
    * to its route's schedule identity. The scraped `route` column holds
    * the rider-facing line number — GTFS `route_short_name`, NOT
    * `route_id` (dags/warsaw-delays.py:182 scrapes the UI label) — so
    * that is the join key. Observations with no schedule match survive
    * (left join) under a NULL long name: a scrape of a diverted/ghost
    * line is signal, not noise.
    *
    * Output per (route, route_long_name, route_type): observation count,
    * exact total delay seconds (long), max delay, and the mean delay in
    * exact deci-second integer grain (one integer divide, no float
    * folds). */
  def delayByRoute(delayObs: DataFrame, routes: DataFrame): DataFrame = {
    // Rider-facing short names are NOT unique in GTFS (two agencies may
    // both run a "175") — joining the raw dim would fan every
    // observation out per duplicate and double-count the rollup. One
    // dim row per short name, attributes taken from the min route_id
    // (deterministic representative).
    val dim = routes
      .groupBy(col("route_short_name").as("route"))
      .agg(
        min_by(struct(col("route_long_name"), col("route_type")),
          col("route_id")).as("r"))
      .select(col("route"), col("r.route_long_name"), col("r.route_type"))
    delayObs
      .select(col("route"), col("delay_seconds"))
      .join(broadcast(dim), Seq("route"), "left")
      .groupBy("route", "route_long_name", "route_type")
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("delay_seconds").cast("long")).as("total_delay_s"),
        max(col("delay_seconds")).as("max_delay_s"))
      .withColumn("mean_delay_ds", expr("(total_delay_s * 10) div n_obs"))
  }

  /** (b) Stop headway: the gap between consecutive scheduled departures
    * at the same stop within the same service — THE transit service
    * quality metric (riders feel headway, not timetable times). One
    * `lag` window per (stop_id, service_id) over departure seconds
    * (trip_id tiebreak for simultaneous departures); the first departure
    * of a service has no predecessor and is dropped.
    *
    * `stop_times` carries no service key, so trips (schedule-sized)
    * broadcasts in on trip_id. */
  def stopHeadways(stopTimes: DataFrame, trips: DataFrame): DataFrame = {
    val st = stopTimes.select(col("trip_id"), col("stop_id"),
      gtfsTimeSeconds(col("departure_time")).as("dep_s"))
    val w = Window.partitionBy("stop_id", "service_id")
      .orderBy(col("dep_s"), col("trip_id"))
    st.join(broadcast(trips.select(col("trip_id"), col("service_id"),
        col("route_id"))), Seq("trip_id"))
      .withColumn("headway_s", col("dep_s") - lag(col("dep_s"), 1).over(w))
      .filter(col("headway_s").isNotNull)
      .select(col("stop_id"), col("service_id"), col("trip_id"),
        col("route_id"), col("dep_s"), col("headway_s"))
  }

  /** (c) Calendar-exception service expansion: which services run on
    * which concrete dates. Warsaw's feed (like many) is
    * calendar_dates-ONLY — no calendar.txt in the member list
    * (dags/warsaw-gtfs.py:30-39) — so the active set is exactly the
    * exception_type=1 (added) rows minus any exception_type=2 (removed)
    * row for the same (service_id, date): a grouped aggregate, no join.
    * The yyyyMMdd string becomes a real DATE so downstream predicates
    * prune and sort correctly. */
  def activeServices(calendarDates: DataFrame): DataFrame =
    calendarDates
      .groupBy(col("service_id"),
        to_date(col("date"), "yyyyMMdd").as("service_day"))
      .agg(
        max(when(col("exception_type") === 1, 1).otherwise(0)).as("added"),
        max(when(col("exception_type") === 2, 1).otherwise(0)).as("removed"))
      .filter(col("added") === 1 && col("removed") === 0)
      .select("service_id", "service_day")

  /** (c, continued) Scheduled trips per (service day, route): the
    * expansion joined through trips — "how many runs does line R make
    * on date D". Both inputs are schedule-sized; the active set
    * broadcasts. */
  def tripsPerDay(calendarDates: DataFrame, trips: DataFrame): DataFrame =
    trips.select(col("route_id"), col("service_id"), col("trip_id"))
      .join(broadcast(activeServices(calendarDates)), Seq("service_id"))
      .groupBy("service_day", "route_id")
      .agg(count(lit(1)).as("n_trips"),
        countDistinct(col("service_id")).as("n_services"))

  /** (d) Shape polyline lengths: true haversine meters summed over
    * consecutive shape points — the route-geometry census (km of network
    * per shape, the denominator of every speed/coverage metric). One
    * `lag` window per shape_id ordered by shape_pt_sequence (group size
    * = points per shape, a geometry constant), one keyed aggregate;
    * reuses the engine's codegen'd no-UDF haversine
    * ([[graft.operators.Geo.haversineMeters]]). */
  def shapeLengths(shapes: DataFrame): DataFrame = {
    val w = Window.partitionBy("shape_id").orderBy("shape_pt_sequence")
    shapes
      .withColumn("prev_lat", lag(col("shape_pt_lat"), 1).over(w))
      .withColumn("prev_lon", lag(col("shape_pt_lon"), 1).over(w))
      .withColumn("seg_m", graft.operators.Geo.haversineMeters(
        col("prev_lat"), col("prev_lon"),
        col("shape_pt_lat"), col("shape_pt_lon")))
      .groupBy("shape_id")
      .agg(count(lit(1)).as("n_points"),
        sum(col("seg_m")).as("length_m"))
  }

  /** (e) Worst stops by observed delay: the scraped snapshots join the
    * stop dimension on the rider-facing stop_name (the scraper's only
    * stop key, dags/warsaw-delays.py:182) — broadcast, left so
    * unmatched scrape names survive — rolled up to exact integer totals
    * plus the deci-second integer mean, ranked worst-first with a
    * stable tiebreak. Top-k is `TakeOrdered`, never a global sort. */
  def worstStops(delayObs: DataFrame, stops: DataFrame, k: Int): DataFrame =
    delayObs
      .select(col("stop_name"), col("delay_seconds"))
      // stop_name is not unique either (one named interchange = many
      // platforms/stop_ids) — collapse to one row per name (min stop_id
      // as the representative) so observations never fan out
      .join(broadcast(stops.groupBy(col("stop_name"))
          .agg(min(col("stop_id")).as("stop_id"))),
        Seq("stop_name"), "left")
      .groupBy("stop_name", "stop_id")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("delay_seconds").cast("long")).as("total_delay_s"))
      .withColumn("mean_delay_ds", expr("(total_delay_s * 10) div n_obs"))
      .orderBy(col("mean_delay_ds").desc, col("stop_name").asc)
      .limit(k)

  /** On-disk schema of a landed delays snapshot: the scraper columns
    * plus the two typed columns [[DelaysIngest.run]] derives. */
  val landedDelaysSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    LandingSchemas.delays
      .add(StructField("delay_seconds", IntegerType))
      .add(StructField("outside_flag", BooleanType))
  }

  /** The landed traffic warehouse as a STREAM — the P16 micro-batching
    * consumer: every hourly snapshot the scraper lands becomes a
    * micro-batch (file source over the Hive leaves; declared schema, no
    * inference), and [[delayRollupStream]] keeps a live per-route
    * delay rollup. `Trigger.AvailableNow` drains a backlog exactly
    * once; a continuous trigger tails the directory as DAG 2 lands new
    * hours. */
  def streamDelays(spark: SparkSession, warehouseDir: String): DataFrame =
    spark.readStream
      .schema(landedDelaysSchema)
      .option("maxFilesPerTrigger", "1") // one landed snapshot per batch
      .parquet(s"$warehouseDir/traffic/*/*/*/*")

  /** Streaming per-route hourly delay rollup: tumbling window on the
    * snapshot's ingest timestamp, exact integer totals — the streaming
    * mirror of [[delayByRoute]]'s batch rollup (same 2 h watermark
    * convention as the events stream; state is bounded by
    * routes × active windows). Asserted equal to the batch expression
    * over the same landed files in MobilitySpec. */
  def delayRollupStream(delays: DataFrame): DataFrame =
    delays.withWatermark("ingest_ts", "2 hours")
      .groupBy(window(col("ingest_ts"), "1 hour"), col("route"))
      .agg(count(lit(1)).as("n_obs"),
        sum(col("delay_seconds").cast("long")).as("total_delay_s"))
      .select(col("window.start").as("wstart"), col("route"),
        col("n_obs"), col("total_delay_s"))

  /** (f) Dead routes: routes whose service never runs in the expansion
    * window — the schedule-integrity check a feed consumer runs after
    * every ingest (a route with trips but no active calendar date is a
    * data bug or a seasonal line). Anti-join through trips against the
    * active-service set; all schedule-sized. */
  def deadRoutes(routes: DataFrame, trips: DataFrame,
      calendarDates: DataFrame): DataFrame = {
    val liveRouteIds = trips
      .join(broadcast(activeServices(calendarDates)
        .select("service_id").distinct()), Seq("service_id"))
      .select("route_id").distinct()
    routes.join(liveRouteIds, Seq("route_id"), "left_anti")
      .select(col("route_id"), col("route_short_name"),
        col("route_long_name"))
  }
}
