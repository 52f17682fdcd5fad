package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

case class TestEvent(ts: Timestamp, event_type: String, user_id: Long, value: Double)

case class OhlcEvent(ts: Timestamp, event_type: String, event_id: Long, value: Double)

/** Structured-streaming behavior (SURVEY.md §5.2 item 4): watermark
  * late-row dropping, checkpointed exactly-once AvailableNow runs, and
  * batch/stream equivalence of the window expressions. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops rows later than 2 hours in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val counts = EventStream.tumblingCounts(mem.toDF())
    val q = counts.writeStream
      .format("memory").queryName("wm_out").outputMode("append")
      .start()
    try {
      // batch 1: one event at 10:00, one at 15:00 → watermark → 13:00
      mem.addData(TestEvent(ts("2024-01-01 10:10:00"), "click", 1L, 1.0),
        TestEvent(ts("2024-01-01 15:00:00"), "click", 1L, 1.0))
      q.processAllAvailable()
      // batch 2: late row at 10:20 — before the 13:00 watermark → dropped
      mem.addData(TestEvent(ts("2024-01-01 10:20:00"), "click", 9L, 1.0))
      q.processAllAvailable()
      // batch 3: advance watermark past 15:00 so every window closes
      mem.addData(TestEvent(ts("2024-01-02 00:00:00"), "view", 2L, 1.0))
      q.processAllAvailable()
      val out = spark.table("wm_out")
        .select(date_format(col("wstart"), "HH:mm").as("w"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      // the 10:00 window emitted exactly 1 (late row 10:20 dropped)
      assert(out("10:00") == 1L)
      assert(out("15:00") == 1L)
    } finally q.stop()
  }

  test("AvailableNow + checkpoint processes the fixture exactly once") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val src = s"$dir/src"; val out = s"$dir/out"; val cp = s"$dir/cp"
    Files.createDirectories(java.nio.file.Paths.get(src))
    // stage the fixture parquet as a stream source dir
    val fixture = new java.io.File(s"${TestSpark.sf}/events.parquet")
    if (fixture.isDirectory)
      fixture.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f =>
        Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/${f.getName}")))
    else Files.copy(fixture.toPath, java.nio.file.Paths.get(s"$src/events.parquet"))

    val q1 = EventStream.runTumblingAvailableNow(spark, src, out, cp)
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // re-run with the same checkpoint: no new input → no new output rows
    val q2 = EventStream.runTumblingAvailableNow(spark, src, out, cp)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == n1)
  }

  test("sf0.1 file-source AvailableNow: tumbling + session windows equal " +
      "batch on the full 100k-event fixture") {
    // bench-scale integration (VERDICT r8 #9): the REAL sf0.1 events
    // table through the file source — not MemoryStream — in several
    // micro-batches (maxFilesPerTrigger=4 over 12 staged files), with
    // complete-mode memory sinks so every window is observable and the
    // batch comparison is exact with no watermark-finalization carve-out.
    val sfDir = "/root/testdata/sf0.1"
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val dir = Files.createTempDirectory("graft-stream-sf01").toString
    val src = s"$dir/src"
    val batch = Tables.events(spark, sfDir)
    // stage CHRONOLOGICALLY (range-partitioned by ts → part files sort
    // by path in time order): a backlog replay delivers roughly-ordered
    // files, and the session operator drops rows behind the watermark in
    // EVERY output mode — a randomly-shuffled staging makes most of the
    // fixture "late" and silently empties the session state. Sessions
    // spanning a file boundary still exercise cross-micro-batch merge.
    batch.repartitionByRange(12, col("ts")).write.parquet(src)

    import org.apache.spark.sql.streaming.Trigger
    val qT = EventStream.tumblingCounts(EventStream.readEvents(spark, src))
      .writeStream.format("memory").queryName("sf01_tumb")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/cpT")
      .trigger(Trigger.AvailableNow()).start()
    qT.awaitTermination()
    val gotT = spark.table("sf01_tumb").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val wantT = batch
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start"), col("event_type"), col("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(gotT == wantT)
    // every event counted exactly once (sum over a Seq, not the Set)
    assert(spark.table("sf01_tumb").collect().map(_.getLong(2)).sum
      == batch.count())

    val qS = EventStream.sessionCounts(EventStream.readEvents(spark, src))
      .writeStream.format("memory").queryName("sf01_sess")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/cpS")
      .trigger(Trigger.AvailableNow()).start()
    qS.awaitTermination()
    val gotS = spark.table("sf01_sess").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    val wantS = batch
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start"), col("user_id"), col("n"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotS == wantS)
    assert(spark.table("sf01_sess").collect().map(_.getLong(2)).sum
      == batch.count())
  }

  test("streaming hourly OHLC equals batch bars across out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[OhlcEvent]
    val q = graft.streaming.EventStream.hourlyOhlc(mem.toDF()).writeStream
      .format("memory").queryName("ohlc_out").outputMode("append").start()
    val batch1 = Seq(
      OhlcEvent(ts("2024-01-01 10:05:00"), "click", 3L, 5.0),
      OhlcEvent(ts("2024-01-01 10:01:00"), "click", 1L, 9.0),
      OhlcEvent(ts("2024-01-01 10:01:00"), "click", 2L, 2.0), // ts tie → id
      OhlcEvent(ts("2024-01-01 10:40:00"), "view", 4L, 7.0))
    val batch2 = Seq( // arrives later but EARLIER in event time (in-watermark)
      OhlcEvent(ts("2024-01-01 10:55:00"), "click", 5L, 1.0),
      OhlcEvent(ts("2024-01-01 11:30:00"), "click", 6L, 4.0))
    val closer = OhlcEvent(ts("2024-01-02 00:00:00"), "view", 99L, 0.0)
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      mem.addData(closer); q.processAllAvailable()
      val got = spark.table("ohlc_out")
        .select(date_format(col("wstart"), "yyyy-MM-dd HH:mm").as("hr"),
          col("event_type"), col("open"), col("high"), col("low"),
          col("close"), col("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6)))).toMap
      // the closer's own window never closes → batch side excludes it
      val want = graft.operators.TimeSeries
        .ohlcBars((batch1 ++ batch2).toDF(), "event_type")
        .collect().map(r =>
          (new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm")
            .format(r.getTimestamp(1)), r.getString(0)) ->
          ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getLong(6)))).toMap
      assert(got == want && got.nonEmpty)
      // the tie at 10:01 resolved by event_id: open = id 1's value
      assert(got(("2024-01-01 10:00", "click"))._1 == 9.0)
    } finally q.stop()
  }

  test("streaming sliding windows assign each event to exactly two windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val q = EventStream.slidingCounts(mem.toDF()).writeStream
      .format("memory").queryName("sl_out").outputMode("append").start()
    try {
      mem.addData(TestEvent(ts("2024-01-01 10:10:00"), "click", 1L, 1.0))
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-02 00:00:00"), "view", 2L, 1.0))
      q.processAllAvailable()
      val ws = spark.table("sl_out")
        .filter(col("event_type") === "click")
        .collect().map(r => r.getTimestamp(0).toString).sorted.toSeq
      // 10:10 falls in [09:30,10:30) and [10:00,11:00)
      assert(ws == Seq("2024-01-01 09:30:00.0", "2024-01-01 10:00:00.0"))
    } finally q.stop()
  }

  test("streaming session windows close after watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val q = EventStream.sessionCounts(mem.toDF()).writeStream
      .format("memory").queryName("se_out").outputMode("append").start()
    try {
      mem.addData(
        TestEvent(ts("2024-01-01 10:00:00"), "click", 7L, 1.0),
        TestEvent(ts("2024-01-01 10:10:00"), "click", 7L, 1.0))
      q.processAllAvailable()
      assert(spark.table("se_out").count() == 0) // session still open
      mem.addData(TestEvent(ts("2024-01-02 00:00:00"), "view", 8L, 1.0))
      q.processAllAvailable()
      val sess = spark.table("se_out").filter(col("user_id") === 7L)
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
      assert(sess.toSeq == Seq(("2024-01-01 10:00:00.0", 2L))) // merged session of 2
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes replayed event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    case class IdEvent(ts: Timestamp, event_id: Long)
    val mem = MemoryStream[TestEvent]
    // reuse TestEvent; user_id stands in as the dedup key via rename
    val deduped = EventStream.dedupedStream(
      mem.toDF().withColumnRenamed("user_id", "event_id"))
    val q = deduped.writeStream
      .format("memory").queryName("dd_out").outputMode("append").start()
    try {
      mem.addData(
        TestEvent(ts("2024-01-01 10:00:00"), "click", 100L, 1.0),
        TestEvent(ts("2024-01-01 10:01:00"), "click", 100L, 2.0), // dup id
        TestEvent(ts("2024-01-01 10:02:00"), "view", 101L, 3.0))
      q.processAllAvailable()
      mem.addData( // replay within watermark → dropped
        TestEvent(ts("2024-01-01 10:03:00"), "click", 100L, 4.0))
      q.processAllAvailable()
      val ids = spark.table("dd_out").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(100L, 101L))
    } finally q.stop()
  }

  test("stream-static join enriches events with a broadcast dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[TestEvent]
    val q = EventStream.enriched(mem.toDF(), dim).writeStream
      .format("memory").queryName("en_out").outputMode("append").start()
    try {
      mem.addData(
        TestEvent(ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
        TestEvent(ts("2024-01-01 10:00:01"), "click", 9L, 1.0))
      q.processAllAvailable()
      val out = spark.table("en_out")
        .select("user_id", "tier").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(out == Set((1L, Some("gold")), (9L, None)))
    } finally q.stop()
  }

  test("foreachBatch dynamic-overwrite sink is idempotent under re-run") {
    val dir = Files.createTempDirectory("graft-feb").toString
    val src = s"$dir/src"; val out = s"$dir/out"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val fixture = new java.io.File(s"${TestSpark.sf}/events.parquet")
    if (fixture.isDirectory)
      fixture.listFiles().filter(_.getName.endsWith(".parquet")).foreach(f =>
        Files.copy(f.toPath, java.nio.file.Paths.get(s"$src/${f.getName}")))
    else Files.copy(fixture.toPath, java.nio.file.Paths.get(s"$src/events.parquet"))

    val q1 = EventStream.runForeachBatchUpsert(spark, src, out, s"$dir/cp1")
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 > 0)
    // replay with a FRESH checkpoint (worst case: everything reprocessed)
    // → dynamic partition overwrite rewrites the same partitions, no dupes
    val q2 = EventStream.runForeachBatchUpsert(spark, src, out, s"$dir/cp2")
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == n1)
  }

  test("streaming distinct actives per hour equal the batch distinct count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      TestEvent(ts("2024-01-01 10:10:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 10:20:00"), "click", 1L, 1.0), // dup user in hour
      TestEvent(ts("2024-01-01 10:40:00"), "view", 2L, 1.0),
      TestEvent(ts("2024-01-01 11:10:00"), "view", 1L, 1.0))
    val mem = MemoryStream[TestEvent]
    val q = EventStream.tumblingActiveUsers(mem.toDF()).writeStream
      .format("memory").queryName("au_out").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-02 00:00:00"), "view", 9L, 1.0)) // closes
      q.processAllAvailable()
      val streamed = spark.table("au_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      val batch = events.toDF()
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct("user_id").as("n"))
        .select(col("window.start"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
      // both closed hours emitted with exact distinct counts (10h → 2, 11h → 1)
      assert(streamed == batch.filter(_._1.before(ts("2024-01-02 00:00:00"))))
      assert(streamed.values.toSeq.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming tumbling counts equal the batch expression on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      TestEvent(ts("2024-01-01 10:10:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 10:40:00"), "click", 2L, 1.0),
      TestEvent(ts("2024-01-01 11:10:00"), "view", 1L, 1.0),
      TestEvent(ts("2024-01-02 00:00:00"), "view", 2L, 1.0)) // closes all
    val mem = MemoryStream[TestEvent]
    val q = EventStream.tumblingCounts(mem.toDF()).writeStream
      .format("memory").queryName("eq_out").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-03 00:00:00"), "view", 2L, 1.0))
      q.processAllAvailable()
      val streamed = spark.table("eq_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = events.toDF()
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // streamed output (closed windows) ⊆ batch; open windows may be absent
      assert(streamed.subsetOf(batch))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: watermark-held emit, timeout close") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("fs_out").outputMode("append").start()
    try {
      // user 7: two events 10 min apart (one session), then a 12:00 event
      // >30 min later — the in-batch gap splits them, but NOTHING is
      // emitted yet: the watermark (12:00 − 2 h = 10:00) has not passed
      // session 1's close (10:40), and append-mode session semantics emit
      // only what can no longer grow (a late 10:35 event could still
      // extend session 1)
      mem.addData(
        TestEvent(ts("2024-01-01 10:00:00"), "click", 7L, 1.5),
        TestEvent(ts("2024-01-01 10:10:00"), "click", 7L, 2.5),
        TestEvent(ts("2024-01-01 12:00:00"), "click", 7L, 4.0))
      q.processAllAvailable()
      assert(spark.table("fs_out").count() == 0)
      // advance the watermark past 12:00 + 30 min gap → timeout emits the
      // open session and drops the key
      mem.addData(TestEvent(ts("2024-01-02 00:00:00"), "view", 8L, 0.0))
      q.processAllAvailable()
      val all = spark.table("fs_out").as[graft.streaming.SessionOut]
        .collect().toSeq.sortBy(_.session_start.getTime)
      assert(all.map(s => (s.user_id, s.n_events, s.total_value)) ==
        Seq((7L, 2L, 4.0), (7L, 1L, 4.0)))
      assert(all(1).session_start == ts("2024-01-01 12:00:00"))
    } finally q.stop()
  }

  test("userSessions closes the same sessions as batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // gap-rule edge: 10:00 → 10:30 is EXACTLY the 30-min gap — merged by
    // session_window (strictly-greater starts a new session) and must be
    // merged by the custom-state operator too
    val events = Seq(
      TestEvent(ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 10:30:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 11:30:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 09:00:00"), "view", 2L, 1.0))
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("eqs_out").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-03 00:00:00"), "view", 9L, 1.0))
      q.processAllAvailable()
      val streamed = spark.table("eqs_out")
        .filter(col("user_id").isin(1L, 2L))
        .select("user_id", "session_start", "n_events")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      val batch = events.toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("session_window.start"), col("n"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("userSessions: session is not closed while wm == last + gap (boundary merge)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1 opens [10:00]; batch 2 advances the watermark to EXACTLY
    // 10:30 = last + gap (12:30 − 2 h). Batch 3 offers an event at
    // ts == wm — Spark's late-row filter DROPS it (verified here), so it
    // must neither extend the session nor appear as its own session; the
    // operator's strict close (last + gap < wm) is defense-in-depth for
    // the delivered-at-boundary case, and the output must equal batch
    // session_window over the events Spark actually delivered.
    val delivered = Seq(
      TestEvent(ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 12:30:00"), "view", 2L, 1.0))
    val boundary = TestEvent(ts("2024-01-01 10:30:00"), "click", 1L, 1.0)
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("bnd_out").outputMode("append").start()
    try {
      mem.addData(delivered(0))
      q.processAllAvailable()
      mem.addData(delivered(1)) // wm := 10:30 exactly
      q.processAllAvailable()
      mem.addData(boundary) // ts == wm → filtered as late
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-03 00:00:00"), "view", 9L, 1.0))
      q.processAllAvailable()
      val streamed = spark.table("bnd_out")
        .filter(col("user_id") === 1L)
        .select("session_start", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      val batch = delivered.toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .filter(col("user_id") === 1L)
        .select(col("session_window.start"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
      assert(streamed == batch,
        s"streamed $streamed != batch-over-delivered $batch")
      assert(streamed == Set((ts("2024-01-01 10:00:00"), 1L)))
    } finally q.stop()
  }

  test("userSessions handles out-of-order events arriving in a later batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1 opens a session at 12:00-12:10; batch 2 delivers two EARLIER
    // events still inside the 2 h watermark: 11:00 (more than the 30-min
    // gap before session start → must become its own earlier session, not
    // be absorbed) and 11:40 (within gap of 12:00 → must merge and LOWER
    // session_start to 11:40). Compared against batch session_window.
    val b1 = Seq(
      TestEvent(ts("2024-01-01 12:00:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 12:10:00"), "click", 1L, 2.0))
    val b2 = Seq(
      TestEvent(ts("2024-01-01 11:00:00"), "click", 1L, 4.0),
      TestEvent(ts("2024-01-01 11:40:00"), "click", 1L, 8.0))
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("ooo_out").outputMode("append").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable() // watermark now 10:10
      mem.addData(b2: _*)
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-03 00:00:00"), "view", 9L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("ooo_out")
        .filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events", "total_value")
        .collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = (b1 ++ b2).toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("session_window.start"), col("session_window.end"),
          col("n"), col("v"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      // session_window's end = last + gap; ours = last event time — align
      val streamedAligned = streamed.map { case (s, e, n, v) =>
        (s, new Timestamp(e.getTime + 30 * 60 * 1000L), n, v) }
      assert(streamedAligned == batch)
      assert(streamed.map(_._1.toString).contains("2024-01-01 11:40:00.0"))
    } finally q.stop()
  }

  test("late event extends an OLDER still-open session, not just the newest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1 leaves TWO sessions open for user 1: (10:00) and (12:20);
    // watermark is 10:20, before session 1's 10:30 close. batch 2's late
    // 10:25 event is within gap of session 1 — it must extend the OLDER
    // buffered session (10:00–10:25, n=2), which a single-open-session
    // state cannot represent.
    val b1 = Seq(
      TestEvent(ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
      TestEvent(ts("2024-01-01 12:20:00"), "click", 1L, 2.0))
    val b2 = Seq(TestEvent(ts("2024-01-01 10:25:00"), "click", 1L, 4.0))
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("late_out").outputMode("append").start()
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-03 00:00:00"), "view", 9L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("late_out")
        .filter(col("user_id") === 1L)
        .select("session_start", "session_end", "n_events", "total_value")
        .collect()
        .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3))).toSet
      assert(streamed == Set(
        ("2024-01-01 10:00:00.0", "2024-01-01 10:25:00.0", 2L, 5.0),
        ("2024-01-01 12:20:00.0", "2024-01-01 12:20:00.0", 1L, 2.0)))
      // and it is exactly what batch session_window computes on the union
      val batch = (b1 ++ b2).toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("session_window.start"), col("n"), col("v"))
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDouble(2))).toSet
      assert(streamed.map(s => (s._1, s._3, s._4)) == batch)
    } finally q.stop()
  }

  test("userSessions equals batch session_window on randomized event sets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // fixed-seed randomized corpus: 60 events, 3 users, random minute
    // offsets across a day — every session closes once the far-future
    // event advances the watermark, so FULL set equality must hold.
    // integer-valued doubles keep the per-session sums order-independent.
    val rnd = new scala.util.Random(42)
    val events = Seq.fill(60)(TestEvent(
      new Timestamp(ts("2024-01-01 00:00:00").getTime + rnd.nextInt(24 * 60) * 60_000L),
      "click", 1L + rnd.nextInt(3), (1 + rnd.nextInt(5)).toDouble))
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("rnd_out").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(TestEvent(ts("2024-01-05 00:00:00"), "view", 99L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("rnd_out")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "session_start", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = events.toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("user_id"), col("session_window.start"), col("n"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("userSessions equals batch session_window under randomized multi-batch out-of-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 120 events over 4 h, 3 users; delivered as 8 half-hour batches with
    // a seeded 30% of each batch HELD BACK one batch (arrival delay ≤ 1 h,
    // safely inside the 2 h watermark, so nothing is dropped — only
    // reordered across batches). Full set equality with batch
    // session_window must survive any such delivery schedule.
    val rnd = new scala.util.Random(1234)
    val events = Seq.fill(120)(TestEvent(
      new Timestamp(ts("2024-01-01 00:00:00").getTime + rnd.nextInt(4 * 60) * 60_000L),
      "click", 1L + rnd.nextInt(3), (1 + rnd.nextInt(5)).toDouble))
    val batches0 = (0 until 8).map(i => events.filter { e =>
      val m = (e.ts.getTime - ts("2024-01-01 00:00:00").getTime) / 60_000L
      m >= i * 30 && m < (i + 1) * 30
    })
    // push a seeded 30% of each batch into the next delivery slot
    val held = batches0.map(_.filter(_ => rnd.nextDouble() < 0.3))
    val batches = (0 until 9).map { i =>
      val fresh = if (i < 8) batches0(i).diff(held(i)) else Seq.empty
      val late = if (i > 0 && i <= 8) held(i - 1) else Seq.empty
      fresh ++ late
    }
    val mem = MemoryStream[TestEvent]
    val q = EventStream.userSessions(mem.toDF()).writeStream
      .format("memory").queryName("mb_out").outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) { mem.addData(b: _*); q.processAllAvailable() }
      }
      mem.addData(TestEvent(ts("2024-01-05 00:00:00"), "view", 99L, 0.0))
      q.processAllAvailable()
      val streamed = spark.table("mb_out")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "session_start", "n_events", "total_value")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = events.toDF()
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
        .select(col("user_id"), col("session_window.start"), col("n"), col("v"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with in-window purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val q = EventStream.clickPurchaseJoin(mem.toDF()).writeStream
      .format("memory").queryName("ss_out").outputMode("append").start()
    try {
      mem.addData(
        TestEvent(ts("2024-01-01 10:00:00"), "click", 1L, 1.0),
        TestEvent(ts("2024-01-01 10:30:00"), "purchase", 1L, 9.0), // in window
        TestEvent(ts("2024-01-01 12:00:00"), "purchase", 1L, 5.0), // beyond 1 h
        TestEvent(ts("2024-01-01 10:20:00"), "purchase", 2L, 3.0)) // other user
      q.processAllAvailable()
      // close the join state: the event_type filters sit BELOW the
      // watermark nodes after pushdown, so the advancing rows must be a
      // click and a purchase (a "view" would reach neither node); the
      // user-9 pair cannot match (purchase precedes click)
      mem.addData(
        TestEvent(ts("2024-01-02 02:00:00"), "click", 9L, 0.0),
        TestEvent(ts("2024-01-02 00:00:00"), "purchase", 9L, 0.0))
      q.processAllAvailable()
      val out = spark.table("ss_out")
        .collect().map(r => (r.getLong(0), r.getTimestamp(2).toString)).toSet
      assert(out == Set((1L, "2024-01-01 10:30:00.0")))
    } finally q.stop()
  }

  test("outer interval join emits NULL rows for unmatched clicks after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TestEvent]
    val q = EventStream.clickPurchaseJoinOuter(mem.toDF()).writeStream
      .format("memory").queryName("sso_out").outputMode("append").start()
    try {
      mem.addData(
        TestEvent(ts("2024-01-01 10:00:00"), "click", 1L, 1.0),    // matched
        TestEvent(ts("2024-01-01 10:30:00"), "purchase", 1L, 9.0),
        TestEvent(ts("2024-01-01 10:00:00"), "click", 2L, 1.0))    // organic
      q.processAllAvailable()
      // user 2's NULL row may only surface once the watermark proves no
      // in-window purchase can still arrive. Subtlety: the event_type
      // filters are pushed BELOW each branch's EventTimeWatermark node,
      // so a nudge row advances a side's watermark only if it survives
      // that side's filter — the nudges must be a click AND a purchase
      // (the global watermark is the min across both nodes), and the
      // eviction itself runs one batch after the watermark update.
      // The user-9 nudge purchase precedes its click, so neither nudge
      // ever matches; user 9 is excluded from the assertion.
      mem.addData(
        TestEvent(ts("2024-01-02 02:00:00"), "click", 9L, 0.0),
        TestEvent(ts("2024-01-02 00:00:00"), "purchase", 9L, 0.0))
      q.processAllAvailable()
      mem.addData(
        TestEvent(ts("2024-01-02 03:00:00"), "click", 9L, 0.0),
        TestEvent(ts("2024-01-02 01:00:00"), "purchase", 9L, 0.0))
      q.processAllAvailable()
      val out = spark.table("sso_out").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(2)).map(_.toString)))
        .filter(_._1 != 9L).toSet
      assert(out == Set(
        (1L, Some("2024-01-01 10:30:00.0")),
        (2L, None)))
    } finally q.stop()
  }

  test("streamIngest dedups across micro-batches through persistent state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-si").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.IncrementalDedup.streamIngest(spark,
      mem.toDF().toDF("doc_id", "text"),
      s"$dir/state", s"$dir/out", s"$dir/ckpt")
    try {
      mem.addData((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      q.processAllAvailable()
      // batch 2: exact dup of doc 1, reordered (near-dup) of doc 2, one new
      mem.addData((3L, "alpha beta gamma delta"),
        (4L, "theta eta zeta epsilon"),
        (5L, "iota kappa lambda mu"))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 2L, 5L))
      // the same state serves subsequent BATCH ingests (one corpus state)
      val b3 = Seq((6L, "iota kappa lambda mu"), (7L, "nu xi omicron pi"))
        .toDF("doc_id", "text")
      val s3 = graft.operators.IncrementalDedup.ingest(spark, b3, s"$dir/state")
      assert(s3.select("doc_id").collect().map(_.getLong(0)).toSet == Set(7L))
    } finally q.stop()
  }

  test("streamIngest quality gate rejects docs before they claim dedup state") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sig").toString
    // gate: word count >= 4 (a thin stand-in for the full Gopher gate,
    // which needs 50+ words per doc — same shape: map-side keep filter)
    val gate = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")) >= 4)
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.IncrementalDedup.streamIngest(spark,
      mem.toDF().toDF("doc_id", "text"),
      s"$dir/state", s"$dir/out", s"$dir/ckpt", gate)
    try {
      // doc 1 passes; doc 2 fails the gate (3 words)
      mem.addData((1L, "alpha beta gamma delta"), (2L, "too short doc"))
      q.processAllAvailable()
      // CRITICAL ordering property: the rejected doc 2 must not have
      // claimed state — a later clean duplicate of its text must land
      mem.addData((3L, "too short doc padded out"),
        (4L, "alpha beta gamma delta")) // dup of landed doc 1: suppressed
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 3L))
    } finally q.stop()
  }

  test("streamIngestEmbeddings dedups vectors across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-sie").toString
    def unit(axis: Int): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1.0f else 0.0f)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.IncrementalDedup.streamIngestEmbeddings(spark,
      mem.toDF().toDF("vec_id", "embedding"),
      s"$dir/state", s"$dir/out", s"$dir/ckpt")
    try {
      mem.addData((1L, unit(0)), (2L, unit(1)))
      q.processAllAvailable()
      // batch 2: exact dup of vector 1 (cosine 1), one orthogonal new
      mem.addData((3L, unit(0)), (4L, unit(2)))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 2L, 4L))
      // the same state serves subsequent BATCH ingests
      val b3 = Seq((5L, unit(2)), (6L, unit(3)))
        .toDF("vec_id", "embedding")
      val s3 = graft.operators.IncrementalDedup
        .ingestEmbeddings(spark, b3, s"$dir/state")
      assert(s3.select("vec_id").collect().map(_.getLong(0)).toSet
        == Set(6L))
    } finally q.stop()
  }

  test("transformWithState first-seen dedup suppresses dups across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState runs only on the RocksDB state store
    val priorProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    val dir = Files.createTempDirectory("graft-tws").toString
    val q = graft.streaming.FirstSeen.firstSeen(mem.toDS())
      .toDF("digest", "doc_id")
      .writeStream.format("memory").queryName("tws_out").outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      // batch 1: in-batch dup of A (keeps min id 1), first B
      mem.addData(("A", 3L), ("A", 1L), ("B", 2L))
      q.processAllAvailable()
      // batch 2: A and B again (cross-batch dups — suppressed), first C
      mem.addData(("A", 9L), ("B", 8L), ("C", 4L))
      q.processAllAvailable()
      val out = spark.sql("SELECT digest, doc_id FROM tws_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(out == Set(("A", 1L), ("B", 2L), ("C", 4L)))
    } finally {
      q.stop()
      priorProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState TTL: an expired digest re-emits, a live one " +
      "stays suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val priorProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long)]
    val dir = Files.createTempDirectory("graft-tws-ttl").toString
    // generous margins so host load can't flip the outcome: A must age
    // PAST the 6 s horizon (10 s sleep), B must stay WELL inside it
    // (read immediately after its batch)
    val ttl = java.time.Duration.ofSeconds(6)
    // TimeMode.ProcessingTime makes the micro-batch engine re-run
    // no-data batches continuously (shouldRunAnotherBatch is
    // unconditionally true — processing time always advances), so
    // processAllAvailable spins forever and Trigger.AvailableNow never
    // self-terminates (measured: 1,898 no-data jobs before the first
    // rewrite of this test was killed); the memory sink also refuses
    // checkpoint recovery, ruling out restart-per-phase. So: ONE
    // long-lived query, and each phase polls lastProgress until its
    // own source offset has been processed.
    val q = graft.streaming.FirstSeen.firstSeenWithTtl(mem.toDS(), ttl)
      .toDF("digest", "doc_id")
      .writeStream.format("memory").queryName("tws_ttl_out")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def pass(data: (String, Long)*): Seq[(String, Long)] = {
      val off = mem.addData(data: _*).json.toLong
      def committed = Option(q.lastProgress).exists(p =>
        p.sources.nonEmpty &&
          Option(p.sources(0).endOffset).exists(_.toLong >= off))
      val deadline = System.nanoTime + 120L * 1000 * 1000 * 1000
      while (!committed && System.nanoTime < deadline) Thread.sleep(100)
      assert(committed, s"offset $off not processed in 120 s")
      spark.sql("SELECT digest, doc_id FROM tws_ttl_out")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    }
    try {
      assert(pass(("A", 3L), ("A", 1L)) == Seq(("A", 1L))) // batch-min id
      Thread.sleep(10000) // A's first-seen mark ages past the horizon
      assert(pass(("B", 2L)).toSet == Set(("A", 1L), ("B", 2L)))
      // A expired (re-emits with the new batch's min id); B live
      // (suppressed). Same pass, so one clock serves both checks.
      assert(pass(("A", 7L), ("B", 8L)).toSet ==
        Set(("A", 1L), ("B", 2L), ("A", 7L)),
        "expired A must re-emit once; live B must stay suppressed")
      // and the re-emitted A is live again: an immediate dup suppresses
      val end = pass(("A", 9L))
      assert(end.count(_._1 == "A") == 2 && end.size == 3)
    } finally {
      q.stop()
      priorProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming rollup partials re-sum to the exact batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-rollup").toString
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    // a reader racing the first micro-batch sees an empty rollup, not a
    // missing-path error
    assert(EventStream.rollupState(spark, s"$dir/state").count() == 0)
    val mem = MemoryStream[TestEvent]
    val q = EventStream.streamRollupPartials(mem.toDF(),
      s"$dir/state", s"$dir/ckpt")
    val batches = Seq(
      Seq(TestEvent(ts("2024-01-01 10:00:00"), "view", 1L, 1.25),
        TestEvent(ts("2024-01-01 11:00:00"), "click", 1L, 2.50),
        TestEvent(ts("2024-01-02 10:00:00"), "view", 2L, 0.75)),
      Seq(TestEvent(ts("2024-01-01 12:00:00"), "view", 3L, 4.00)),
      Seq(TestEvent(ts("2024-01-03 09:00:00"), "purchase", 1L, 9.99),
        TestEvent(ts("2024-01-01 13:00:00"), "view", 1L, 0.01)))
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = EventStream.rollupState(spark, s"$dir/state")
        .collect().map(r => (r.getDate(0).toString, r.getString(1),
          r.getLong(2), r.getDecimal(3))).toSet
      val want = batches.flatten.toDF()
        .withColumn("day", to_date(col("ts")))
        .groupBy("day", "event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec2)).cast(dec2).as("s"))
        .collect().map(r => (r.getDate(0).toString, r.getString(1),
          r.getLong(2), r.getDecimal(3))).toSet
      assert(got == want)
      assert(got.exists(_._1 == "2024-01-01") && got.size >= 4)
    } finally q.stop()
  }

  test("transformWithState event-time timers close sessions at " +
    "watermark + gap, not at batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val priorProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val dir = Files.createTempDirectory("graft-twstimer").toString
    val q = graft.streaming.SessionTimeout.sessions(
        mem.toDS().withWatermark("_2", "0 seconds"),
        gapMs = 30 * 60 * 1000L)
      .toDF("user_id", "session_start", "session_end", "n_events", "sum_v")
      .writeStream.format("memory").queryName("tws_sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    def outRows() = spark.sql(
        "SELECT user_id, session_start, session_end, n_events, sum_v " +
          "FROM tws_sessions")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet
    try {
      // user 1: two events 10 min apart — one session once expired
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:10:00"), 2.0))
      q.processAllAvailable()
      assert(outRows().isEmpty, "no watermark movement yet — nothing closes")
      // user 2 event at 10:20 → watermark 10:20 < 10:10+30min: still open
      mem.addData((2L, ts("2024-01-01 10:20:00"), 5.0))
      q.processAllAvailable()
      assert(outRows().isEmpty,
        "session 1 must stay open until watermark passes last+gap")
      // user 1 event at 11:00: the 50-min in-data gap SPLITS session 1
      // at input time (emitted immediately); the watermark advance to
      // 11:00 then fires user 2's 10:50 timer, closing their session —
      // user 1's re-armed 11:30 timer stays pending
      mem.addData((1L, ts("2024-01-01 11:00:00"), 7.0))
      q.processAllAvailable()
      assert(outRows() == Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.0),
        (2L, "2024-01-01 10:20:00.0", "2024-01-01 10:20:00.0", 1L, 5.0)),
        s"split + timer close expected, got ${outRows()}")
      // push watermark far ahead → the trailing user-1 session closes
      mem.addData((9L, ts("2024-01-01 23:00:00"), 0.0))
      q.processAllAvailable()
      assert(outRows() == Set(
        (1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.0),
        (1L, "2024-01-01 11:00:00.0", "2024-01-01 11:00:00.0", 1L, 7.0),
        (2L, "2024-01-01 10:20:00.0", "2024-01-01 10:20:00.0", 1L, 5.0)))
    } finally {
      q.stop()
      priorProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState replays exactly-once after a crash between " +
    "sink write and checkpoint commit") {
    // Round-11 failure injection (VERDICT r10 item 7): the batch-side
    // crash-window ordering is tested in IncrementalDedup; this is the
    // streaming-side twin. A foreachBatch sink WRITES its output and then
    // dies before the micro-batch commits — the worst-case window. On
    // restart from the same checkpoint the offset WAL replays the batch;
    // the RocksDB state store must serve the PRE-batch state version (the
    // failed attempt's updates were never committed), so the processor
    // re-emits identical rows and the batchId-keyed overwrite sink (the
    // runForeachBatchUpsert idempotence pattern) lands exactly-once.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-crash").toString
    val (srcDir, outDir, ckpt) = (s"$dir/src", s"$dir/out", s"$dir/ckpt")
    val priorProvider =
      spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    def writeFile(name: String, rows: (String, Long)*): Unit =
      rows.toSeq.toDF("digest", "doc_id").coalesce(1)
        .write.mode("overwrite").parquet(s"$srcDir/$name")

    @volatile var crashed = false
    def start(injectCrash: Boolean) = {
      val src = spark.readStream
        .schema("digest STRING, doc_id BIGINT")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$srcDir/*")
        .as[(String, Long)]
      graft.streaming.FirstSeen.firstSeen(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)],
            batchId: Long) =>
          batch.toDF("digest", "doc_id").write.mode("overwrite")
            .parquet(s"$outDir/b$batchId")
          if (injectCrash && batchId == 1L && !crashed) {
            crashed = true
            throw new RuntimeException(
              "injected crash: sink written, commit pending")
          }
        }
        .start()
    }

    try {
      writeFile("f0", ("A", 1L), ("B", 2L))
      val q1 = start(injectCrash = true)
      q1.processAllAvailable() // batch 0 commits clean
      writeFile("f1", ("A", 9L), ("C", 3L))
      // batch 1 writes out/b1 then dies before its commit
      intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
      assert(crashed, "the injected crash never fired — batch ids moved?")
      assert(!q1.isActive)

      val q2 = start(injectCrash = false)
      try {
        writeFile("f2", ("B", 8L), ("C", 7L), ("D", 4L))
        q2.processAllAvailable() // replays batch 1 from the WAL, then batch 2
        val out = spark.read.parquet(s"$outDir/b*")
          .collect().map(r => (r.getString(0), r.getLong(1)))
        // exactly-once: each digest appears ONCE across all batch dirs,
        // with its original first-seen id — the replayed batch re-emitted
        // identical rows over the same b1 path and later batches still
        // saw the replayed state (C suppressed in batch 2)
        assert(out.sorted.toSeq ==
          Seq(("A", 1L), ("B", 2L), ("C", 3L), ("D", 4L)))
        val b1 = spark.read.parquet(s"$outDir/b1")
          .collect().map(r => (r.getString(0), r.getLong(1))).toSet
        assert(b1 == Set(("C", 3L)),
          s"replayed batch 1 diverged from its first attempt: $b1")
      } finally q2.stop()
    } finally {
      priorProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming CMS cells merge across micro-batches to exact fixture counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-cms").toString
    val mem = MemoryStream[(String, Long)]
    val q = EventStream.streamCmsCells(mem.toDF().toDF("k", "v"),
      col("k"), s"$dir/cells", s"$dir/ckpt")
    try {
      mem.addData(("a", 1L), ("a", 2L), ("b", 1L))
      q.processAllAvailable()
      mem.addData(("a", 3L), ("b", 2L), ("c", 1L))
      q.processAllAvailable()
      val keys = Seq("a", "b", "c").toDF("k")
      val est = EventStream.cmsStateEstimates(spark, s"$dir/cells", keys)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // 3 keys << WIDTH → collision-free: merged estimates are exact
      assert(est == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
      // merged state ≡ a one-shot batch build over the union of batches
      val oneShot = graft.operators.AggQueries.cmsEstimates(
        graft.operators.AggQueries.cmsCells(
          Seq("a", "a", "b", "a", "b", "c").toDF("k"), col("k")),
        keys).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est == oneShot)
    } finally q.stop()
  }
}
