package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.time.LocalDate
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._

/** Pipeline-layer behavior (SURVEY.md §2.1 P4–P13): zip expansion, hash
  * short-circuit, state-after-data ordering, SaveMode semantics. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft-test").toString

  private def writeZip(path: String, members: Map[String, String]): Unit = {
    val zout = new ZipOutputStream(new FileOutputStream(path))
    members.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
  }

  private val stopsCsv =
    "stop_id,stop_name,stop_lat,stop_lon\nS1,Central,52.23,21.01\nS2,North,52.28,21.00\n"
  private val tripsCsv =
    "route_id,service_id,trip_id,trip_headsign\nR1,SV1,T1,Downtown\n"

  test("GtfsIngest: expand → typed tables → short-circuit on unchanged feed") {
    val dir = tmpDir()
    val zip = s"$dir/warsaw.zip"
    val wh = s"$dir/warehouse"
    val state = s"$dir/state.parquet"
    writeZip(zip, Map("stops.txt" -> stopsCsv, "trips.txt" -> tripsCsv))
    val date = LocalDate.of(2024, 12, 23)

    assert(GtfsIngest.run(spark, zip, wh, state, date)) // first run ingests
    val stops = spark.read.parquet(s"$wh/gtfs/stops/y=2024/m=12/d=23")
    assert(stops.count() == 2)
    assert(stops.schema("stop_lat").dataType.typeName == "double")
    // state written and matches the file hash (P6)
    assert(FeedState.readHash(spark, state, "gtfs")
      .contains(FeedState.sha256OfFile(zip)))
    // unchanged feed → short-circuit (P5)
    assert(!GtfsIngest.run(spark, zip, wh, state, date))
    // changed feed → runs again
    writeZip(zip, Map("stops.txt" -> (stopsCsv + "S3,South,52.1,21.2\n")))
    assert(GtfsIngest.run(spark, zip, wh, state, date))
    assert(spark.read.parquet(s"$wh/gtfs/stops/y=2024/m=12/d=23").count() == 3)
  }

  test("GtfsIngest parses all 8 GTFS member tables") {
    val dir = tmpDir()
    val zip = s"$dir/full.zip"
    val members = Map(
      "agency.txt" -> "agency_id,agency_name,agency_url,agency_timezone\nA1,ZTM,http://z,Europe/Warsaw\n",
      "calendar_dates.txt" -> "service_id,date,exception_type\nSV1,20241223,1\n",
      "feed_info.txt" -> "feed_publisher_name,feed_publisher_url,feed_lang\nZTM,http://z,pl\n",
      "routes.txt" -> "route_id,agency_id,route_short_name,route_long_name,route_type\nR1,A1,175,Airport,3\n",
      "shapes.txt" -> "shape_id,shape_pt_lat,shape_pt_lon,shape_pt_sequence\nS,52.1,21.0,1\n",
      "stop_times.txt" -> "trip_id,arrival_time,departure_time,stop_id,stop_sequence\nT1,08:00:00,08:01:00,S1,1\n",
      "stops.txt" -> stopsCsv,
      "trips.txt" -> tripsCsv)
    writeZip(zip, members)
    assert(GtfsIngest.run(spark, zip, s"$dir/wh", s"$dir/state.parquet",
      LocalDate.of(2024, 12, 23)))
    LandingSchemas.gtfs.keys.foreach { t =>
      val df = spark.read.parquet(s"$dir/wh/gtfs/$t/y=2024/m=12/d=23")
      assert(df.count() >= 1, s"table $t empty")
      assert(df.schema == LandingSchemas.gtfs(t), s"schema mismatch for $t")
    }
  }

  test("Ingest.expandZip streams entries executor-side") {
    val dir = tmpDir()
    writeZip(s"$dir/a.zip", Map("x.txt" -> "hello", "sub/y.txt" -> "world"))
    val got = Ingest.expandZip(spark, s"$dir/a.zip").collect()
      .map { case (n, b) => n -> new String(b, "UTF-8") }.toMap
    assert(got == Map("x.txt" -> "hello", "sub/y.txt" -> "world"))
  }

  test("Ingest.stageZip refuses traversal and nested entry names (zip-slip)") {
    val dir = tmpDir()
    // entry names are attacker-controlled remote input: a '..' name must
    // fail the stage loudly, never write outside the staging dir
    writeZip(s"$dir/evil.zip", Map("../escape.txt" -> "pwned"))
    val e = intercept[Exception] {
      Ingest.stageZip(spark, s"$dir/evil.zip", s"$dir/staging")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("non-flat zip entry")), msgs(e).take(3))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/escape.txt")))
    // nested names are also refused: the post-stage listing is
    // non-recursive, so a nested member would be silently dropped
    writeZip(s"$dir/nested.zip", Map("sub/y.txt" -> "world"))
    intercept[Exception] {
      Ingest.stageZip(spark, s"$dir/nested.zip", s"$dir/staging2")
    }
    // flat archives stage exactly as before
    writeZip(s"$dir/ok.zip", Map("x.txt" -> "hello"))
    assert(Ingest.stageZip(spark, s"$dir/ok.zip", s"$dir/staging3")
      == Seq("x.txt"))
  }

  test("DelaysIngest: typed parse + hour partitions + non-overwrite landing") {
    val dir = tmpDir()
    val csv = s"$dir/delays-14.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "type,vehicle_no,brigade,route,trip_headsign,delay_raw,stop_name,outside,ingest_ts\n" +
        "bus,1001,B1,175,Airport,5 min,Centrum,false,2024-12-23 14:00:00\n" +
        "tram,2002,B2,17,Loop,120 s,Rondo,true,2024-12-23 14:00:00\n")
    val wh = s"$dir/warehouse"
    DelaysIngest.run(spark, csv, wh, LocalDate.of(2024, 12, 23), 14)
    val landed = spark.read.parquet(s"$wh/traffic")
    assert(landed.count() == 2)
    val bySec = landed.select("delay_seconds", "outside_flag").collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).toSet
    assert(bySec == Set((300, false), (120, true)))
    assert(landed.select("h").distinct().collect().map(_.getInt(0)).toSeq == Seq(14))
    // P11: landing never silently overwrites
    intercept[Exception] {
      DelaysIngest.run(spark, csv, wh, LocalDate.of(2024, 12, 23), 14)
    }
    // ...but the guard scopes to THE SNAPSHOT, not the table: the next
    // hour (and day) must land into the same base path without error
    DelaysIngest.run(spark, csv, wh, LocalDate.of(2024, 12, 23), 15)
    DelaysIngest.run(spark, csv, wh, LocalDate.of(2024, 12, 24), 0)
    val hours = spark.read.parquet(s"$wh/traffic")
      .select("d", "h").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(hours == Set((23, 14), (23, 15), (24, 0)))
  }

  /** Loopback HTTP fixture: serves `body` (or a 404 for unknown paths),
    * counts hits per path. No real network — 127.0.0.1 ephemeral port. */
  private def withHttpServer[A](routes: Map[String, Array[Byte]])(
      f: (String, collection.mutable.Map[String, Int]) => A): A = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = collection.mutable.Map[String, Int]().withDefaultValue(0)
    server.createContext("/", { exchange =>
      val path = exchange.getRequestURI.getPath
      hits.synchronized { hits(path) = hits(path) + 1 }
      routes.get(path) match {
        case Some(body) =>
          exchange.sendResponseHeaders(200, body.length.toLong)
          exchange.getResponseBody.write(body)
        case None =>
          exchange.sendResponseHeaders(404, -1L)
      }
      exchange.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits)
    finally server.stop(0)
  }

  private def zipBytes(members: Map[String, String]): Array[Byte] = {
    val bout = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(bout)
    members.foreach { case (name, content) =>
      zout.putNextEntry(new ZipEntry(name))
      zout.write(content.getBytes("UTF-8"))
      zout.closeEntry()
    }
    zout.close()
    bout.toByteArray
  }

  test("GtfsIngest.fetchAndRun: P1 fetch → land → hash short-circuit on refetch") {
    val dir = tmpDir()
    val feed = zipBytes(Map("stops.txt" -> stopsCsv))
    withHttpServer(Map("/gtfs/warsaw.zip" -> feed)) { (base, hits) =>
      val staged = java.nio.file.Paths.get(dir, "staging", "warsaw.zip")
      val date = LocalDate.of(2025, 1, 6)
      assert(GtfsIngest.fetchAndRun(spark, s"$base/gtfs/warsaw.zip", staged,
        s"$dir/wh", s"$dir/state.parquet", date))
      assert(spark.read.parquet(s"$dir/wh/gtfs/stops/y=2025/m=01/d=06").count() == 2)
      // second run re-fetches (the reference downloads before hashing)
      // but the unchanged feed short-circuits the ingest
      assert(!GtfsIngest.fetchAndRun(spark, s"$base/gtfs/warsaw.zip", staged,
        s"$dir/wh", s"$dir/state.parquet", date))
      assert(hits("/gtfs/warsaw.zip") == 2)
    }
  }

  test("Fetch follows redirects (feed URLs move behind CDNs)") {
    val payload = "moved content".getBytes("UTF-8")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/old", { exchange =>
      exchange.getResponseHeaders.add("Location",
        s"http://127.0.0.1:${server.getAddress.getPort}/new")
      exchange.sendResponseHeaders(302, -1L)
      exchange.close()
    })
    server.createContext("/new", { exchange =>
      exchange.sendResponseHeaders(200, payload.length.toLong)
      exchange.getResponseBody.write(payload)
      exchange.close()
    })
    server.start()
    try {
      val got = Fetch.bytes(
        s"http://127.0.0.1:${server.getAddress.getPort}/old")
      assert(got.sameElements(payload))
    } finally server.stop(0)
  }

  test("Fetch.toFile raises for status and stages nothing on non-2xx") {
    val dir = tmpDir()
    withHttpServer(Map.empty) { (base, _) =>
      val dest = java.nio.file.Paths.get(dir, "missing.zip")
      val e = intercept[java.io.IOException](
        Fetch.toFile(s"$base/nope.zip", dest))
      assert(e.getMessage.contains("404"))
      assert(!Files.exists(dest), "failed fetch must not land a file")
    }
  }

  test("WeatherIngest.fetchAndRun: exists-guard short-circuits BEFORE the API call") {
    val dir = tmpDir()
    val payload = "station,temp\nWarszawa,21.5\n".getBytes("UTF-8")
    withHttpServer(Map("/api/weather" -> payload)) { (base, hits) =>
      val date = LocalDate.of(2025, 1, 6)
      assert(WeatherIngest.fetchAndRun(spark, s"$base/api/weather", dir, date, 9))
      assert(hits("/api/weather") == 1)
      val landed = spark.read.schema(LandingSchemas.weather)
        .parquet(WeatherIngest.target(dir, date, 9))
      assert(landed.count() == 1)
      assert(landed.head.getAs[Array[Byte]]("body").sameElements(payload))
      // snapshot exists → returns false and the API is NOT hit again
      assert(!WeatherIngest.fetchAndRun(spark, s"$base/api/weather", dir, date, 9))
      assert(hits("/api/weather") == 1)
    }
  }

  test("landing paths: Warsaw zone reproduces the reference layout across the DST jump") {
    import java.time.Instant
    // Europe/Warsaw springs forward 2025-03-30: 02:00 CET → 03:00 CEST
    val beforeJump = Instant.parse("2025-03-30T00:30:00Z") // 01:30 CET
    val afterJump = Instant.parse("2025-03-30T01:30:00Z")  // 03:30 CEST
    assert(LandingPaths.delaysCsv(beforeJump, LandingPaths.Warsaw)
      == "traffic/2025/03/30/delays-01.csv")
    assert(LandingPaths.delaysCsv(afterJump, LandingPaths.Warsaw)
      == "traffic/2025/03/30/delays-03.csv") // hour 02 never exists
    // same instants in the engine default (UTC) keep the skipped hour
    assert(LandingPaths.delaysCsv(afterJump) == "traffic/2025/03/30/delays-01.csv")
    // fall-back 2025-10-26: 03:00 CEST → 02:00 CET; two instants one
    // token apart land on the SAME path — the reference's own collision,
    // absorbed by its (and our) exists/upload guards
    val cest = Instant.parse("2025-10-26T00:30:00Z") // 02:30 CEST
    val cet = Instant.parse("2025-10-26T01:30:00Z")  // 02:30 CET
    assert(LandingPaths.weatherCsv(cest, LandingPaths.Warsaw)
      == LandingPaths.weatherCsv(cet, LandingPaths.Warsaw))
    // cross-midnight divergence: a UTC-evening instant is the NEXT DAY in
    // Warsaw — the whole reason the layout must be zone-explicit
    val eve = Instant.parse("2025-07-01T22:30:00Z")
    assert(LandingPaths.delaysCsv(eve) == "traffic/2025/07/01/delays-22.csv")
    assert(LandingPaths.delaysCsv(eve, LandingPaths.Warsaw)
      == "traffic/2025/07/02/delays-00.csv")
  }

  test("DelaysIngest.runAt lands Warsaw-zone hour partitions across the DST jump") {
    val dir = tmpDir()
    val csv = s"$dir/delays.csv"
    Files.writeString(java.nio.file.Paths.get(csv),
      "type,vehicle_no,brigade,route,trip_headsign,delay_raw,stop_name,outside,ingest_ts\n" +
      "bus,1001,A,175,Centrum,3 min,PlacZawiszy,false,2025-03-30 01:30:00\n")
    val afterJump = java.time.Instant.parse("2025-03-30T01:30:00Z")
    DelaysIngest.runAt(spark, csv, s"$dir/wh-waw", afterJump, LandingPaths.Warsaw)
    DelaysIngest.runAt(spark, csv, s"$dir/wh-utc", afterJump)
    // Warsaw partition is hour 03 (post-jump); UTC keeps hour 01
    assert(spark.read.parquet(s"$dir/wh-waw/traffic/y=2025/m=3/d=30/h=3").count() == 1)
    assert(spark.read.parquet(s"$dir/wh-utc/traffic/y=2025/m=3/d=30/h=1").count() == 1)
  }

  test("ingestWith invokes the survivor sink BEFORE any state append") {
    import spark.implicits._
    import graft.operators.IncrementalDedup
    val state = tmpDir() + "/sink-order-state"
    val batch = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    // the ordering contract: at sink time, nothing of this batch may be
    // in state yet — a crash after the sink commits must replay to the
    // SAME survivor set (state-marked docs would silently vanish)
    var stateDuringSink = -1L
    IncrementalDedup.ingestWith(spark, batch, state) { s =>
      assert(s.count() == 1)
      val digests = new java.io.File(s"$state/digests")
      stateDuringSink = if (digests.exists())
        spark.read.parquet(s"$state/digests").count() else 0L
    }
    assert(stateDuringSink == 0L, "state was appended before the sink ran")
    assert(spark.read.parquet(s"$state/digests").count() == 1)
    // a sink failure must abort the round WITHOUT claiming state, so the
    // retry is a clean rerun
    val state2 = tmpDir() + "/sink-fail-state"
    intercept[RuntimeException] {
      IncrementalDedup.ingestWith(spark, batch, state2) { _ =>
        throw new RuntimeException("sink exploded")
      }
    }
    assert(!new java.io.File(s"$state2/digests").exists(),
      "failed sink must not leave state behind")
  }

  test("IncrementalDedup.ingest: cross-snapshot corpus state round-trip") {
    import spark.implicits._
    import graft.operators.IncrementalDedup
    val state = tmpDir() + "/corpus-state"
    val b1 = Seq((1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    assert(IncrementalDedup.ingest(spark, b1, state).count() == 2)
    val b2 = Seq(
      (3L, "alpha beta gamma delta"), // exact copy of doc 1
      (4L, "theta eta zeta epsilon"), // doc 2's token set reordered → near-dup
      (5L, "iota kappa lambda mu")).toDF("doc_id", "text") // genuinely new
    val s2 = IncrementalDedup.ingest(spark, b2, state)
    assert(s2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(5L))
    // crash-rerun safety: re-ingesting the same batch is a no-op
    assert(IncrementalDedup.ingest(spark, b2, state).count() == 0)
    // state grew by exactly the survivors' rows
    assert(spark.read.parquet(s"$state/digests").count() == 3)
  }

  test("WeatherIngest: SaveMode.Ignore gives blob-exists idempotence") {
    val dir = tmpDir()
    val date = LocalDate.of(2024, 12, 23)
    assert(WeatherIngest.run(spark, "payload-1".getBytes, dir, date, 7))
    // second run is a no-op and reports skip (P10)
    assert(!WeatherIngest.run(spark, "payload-2".getBytes, dir, date, 7))
    val body = spark.read.schema(LandingSchemas.weather)
      .parquet(s"$dir/weather/y=2024/m=12/d=23/h=07")
      .collect()(0).getAs[Array[Byte]]("body")
    assert(new String(body) == "payload-1") // first payload survives
  }

  test("JSONL round-trip: documents land as json lines and read back identically") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir() + "/docs_jsonl"
    val docs = Tables.documents(spark, TestSpark.sf)
    docs.write.json(dir)
    // declared schema (never inferSchema), same engine contract as parquet
    val back = spark.read.schema(docs.schema).json(dir)
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("corrupt JSONL lines quarantine instead of poisoning the batch") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dir = tmpDir() + "/quarantine"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/part-0.json"),
      Seq(
        """{"route_id":"R1","delay":5}""",
        """{"route_id":"R2","delay":}""", // malformed
        """not json at all""",            // malformed
        """{"route_id":"R3","delay":9}"""
      ).mkString("", "\n", "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("route_id", StringType),
      StructField("delay", IntegerType)))
    // the split helper owns the cache Spark requires before a
    // corrupt-column-only query — no caller-side .cache() ceremony
    val (clean, bad, rawParent) = graft.pipeline.SchemaDrift
      .readJsonQuarantineSplit(spark, schema, dir)
    try {
      assert(clean.count() == 2 && bad.count() == 2)
      assert(!clean.columns.contains("_corrupt_record"))
      assert(clean.select("route_id").collect().map(_.getString(0)).sorted
        .toSeq == Seq("R1", "R3"))
      // the raw malformed lines survive verbatim for repair
      val raw = bad.collect().map(_.getString(0)).sorted.toSeq
      assert(raw == Seq("""not json at all""",
        """{"route_id":"R2","delay":}"""))
    } finally {
      // the returned parent is the cache handle — unpersisting it (not a
      // filtered half, which would miss the plan-keyed cache) releases
      // the PERMISSIVE-parsed frame without nuking session-wide caches
      rawParent.unpersist(true)
      assert(spark.sharedState.cacheManager.lookupCachedData(
        rawParent.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
        .isEmpty)
    }
  }

  test("landing manifest: partition-independent digest; detects tampering") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir() + "/manifested"
    val docs = Tables.documents(spark, TestSpark.sf)
    docs.repartition(5).write.parquet(dir)
    val manifest = tmpDir() + "/m.json"
    graft.pipeline.Manifest.write(spark.read.parquet(dir), manifest)
    // verify under a DIFFERENT partitioning/order of the same rows
    assert(graft.pipeline.Manifest.verify(
      spark.read.parquet(dir).repartition(3), manifest))
    // same count, one value changed → digest mismatch
    val tampered = spark.read.parquet(dir)
      .withColumn("n_chars",
        when(col("doc_id") === 7, col("n_chars") + 1)
          .otherwise(col("n_chars")))
    assert(!graft.pipeline.Manifest.verify(tampered, manifest))
    // dropped row → row-count mismatch
    assert(!graft.pipeline.Manifest.verify(
      spark.read.parquet(dir).filter(col("doc_id") =!= 7), manifest))
  }

  test("manifest sum fold catches even-multiplicity swaps the XOR fold cancels") {
    import org.apache.spark.sql.functions._
    val base = tmpDir()
    // duplicate-permitting table: two copies of X, count and XOR would
    // survive swapping them for two copies of Y (x ⊕ x = y ⊕ y = 0)
    val x = Tables.documents(spark, TestSpark.sf).filter(col("doc_id") === 1)
    val y = Tables.documents(spark, TestSpark.sf).filter(col("doc_id") === 2)
    val twoX = x.unionAll(x)
    val twoY = y.unionAll(y)
    val (nx, xx, _, _) = graft.pipeline.Manifest.digestOf(twoX)
    val (ny, xy, _, _) = graft.pipeline.Manifest.digestOf(twoY)
    assert(nx == ny && xx == xy, "premise: count+XOR are blind to the swap")
    val manifest = s"$base/m.json"
    graft.pipeline.Manifest.write(twoX, manifest)
    assert(graft.pipeline.Manifest.verify(twoX, manifest))
    assert(!graft.pipeline.Manifest.verify(twoY, manifest),
      "sum fold must catch the even-multiplicity swap")
    // pre-sum manifests (rows+xor only) still verify
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$base/old.json"),
      s"""{"rows":$nx,"xor":$xx}""")
    assert(graft.pipeline.Manifest.verify(twoX, s"$base/old.json"))
  }

  test("schema drift: appended snapshots with a new column reconcile on read") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir() + "/landed"
    // v1 snapshot: 3 columns; v2 snapshot appends rows WITH a new column
    Seq(("R1", "SV1", "T1"), ("R2", "SV1", "T2"))
      .toDF("route_id", "service_id", "trip_id")
      .write.parquet(dir)
    Seq(("R3", "SV2", "T3", "Downtown"))
      .toDF("route_id", "service_id", "trip_id", "trip_headsign")
      .write.mode("append").parquet(dir)

    // merged read: union schema, old rows NULL in the new column
    val merged = SchemaDrift.readMerged(spark, dir)
    assert(merged.columns.toSet ==
      Set("route_id", "service_id", "trip_id", "trip_headsign"))
    val byTrip = merged.collect()
      .map(r => r.getAs[String]("trip_id") ->
        Option(r.getAs[String]("trip_headsign"))).toMap
    assert(byTrip == Map("T1" -> None, "T2" -> None, "T3" -> Some("Downtown")))

    // declared-schema read: drift is invisible to the v1 consumer, and
    // the full declared (v2) contract fills the gap with NULLs
    val v1 = SchemaDrift.withDeclared(spark,
      org.apache.spark.sql.types.StructType(
        LandingSchemas.gtfs("trips").filter(_.name != "trip_headsign")), dir)
    assert(v1.columns.toSet == Set("route_id", "service_id", "trip_id"))
    assert(v1.count() == 3)
    val full = SchemaDrift.withDeclared(spark, LandingSchemas.gtfs("trips"), dir)
    assert(full.filter(col("trip_headsign").isNull).count() == 2)
  }
}
