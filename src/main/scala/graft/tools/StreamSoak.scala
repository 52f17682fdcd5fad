package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.{EventStream, FirstSeen}

/** Streaming crash-recovery soak at scale fixtures (round 14, VERDICT
  * r13 item 7): drives the three stateful streaming paths —
  * `FirstSeen` (transformWithState cross-batch dedup),
  * `streamRollupPartials` (batch-keyed idempotent rollup state), and
  * `userSessions` (flatMapGroupsWithState sessionization) — over the
  * sf1 1M-event fixture through a real file source, hard-kills the JVM
  * mid-stream (`Runtime.halt`, no graceful stop), resumes from the
  * checkpoints, and asserts the recovered outputs equal an
  * UNINTERRUPTED golden run of the same pipelines — plus exact batch
  * equality for the rollup (the stream's partials re-summed must be
  * bit-identical to `Cdc.rollupAgg` over the whole fixture).
  *
  * Phases (each its own JVM — the crash must not share a process with
  * the checker):
  *   runMain graft.tools.StreamSoak prep   <sfDir> <workDir>
  *   runMain graft.tools.StreamSoak crash  <sfDir> <workDir>   # exits 137
  *   runMain graft.tools.StreamSoak resume <sfDir> <workDir>
  *   runMain graft.tools.StreamSoak golden <sfDir> <workDir>
  *   runMain graft.tools.StreamSoak check  <sfDir> <workDir>
  *
  * What equality proves: file-source batch plans are pinned in the
  * offset log, the parquet sink commits through its manifest, rollup
  * partials overwrite per batch id, and the state stores checkpoint per
  * batch — so a mid-batch kill must replay into byte-identical results.
  * The firstSeen comparison is on KEY SETS plus exactly-once-per-key
  * (its emitted id is the batch-min, and golden-run batch BOUNDARIES
  * may legitimately differ from the crash run's); rollup and session
  * outputs are batch-boundary-independent and compared row-exact. */
object StreamSoak {

  private val Gap = 30 // session gap minutes

  private def session(cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state" +
          ".RocksDBStateStoreProvider")
      .getOrCreate()

  /** The dedup key: coarse on purpose (≈5 types × 1024 user buckets over
    * 1M events) so cross-batch suppression does real work. */
  private def pairs(events: DataFrame) = {
    import events.sparkSession.implicits._
    events.select(
        concat(col("event_type"), lit("#"),
          (col("user_id") % 1024).cast("string")).as("k"),
        col("event_id").as("id"))
      .as[(String, Long)]
  }

  private def startAll(spark: SparkSession, src: String, dir: String,
      tag: String): Seq[org.apache.spark.sql.streaming.StreamingQuery] = {
    val ev = EventStream.readEvents(spark, src)
    val q1 = FirstSeen.firstSeen(pairs(ev)).toDF("k", "id")
      .writeStream.format("parquet")
      .option("path", s"$dir/$tag/firstseen")
      .option("checkpointLocation", s"$dir/$tag/cp_firstseen")
      .trigger(Trigger.AvailableNow()).start()
    val q2 = EventStream.streamRollupPartials(ev,
      s"$dir/$tag/rollup", s"$dir/$tag/cp_rollup", Trigger.AvailableNow())
    val q3 = EventStream.userSessions(ev, Gap)
      .writeStream.format("parquet")
      .option("path", s"$dir/$tag/sessions")
      .option("checkpointLocation", s"$dir/$tag/cp_sessions")
      .trigger(Trigger.AvailableNow()).start()
    Seq(q1, q2, q3)
  }

  private def canon(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
  }

  // ---- ingestWith crash-window soak (round 15, VERDICT r14 item 8) ----
  //
  // Exercises the OTHER documented crash ordering: IncrementalDedup
  // .ingestWith appends bands, then digests, and its docstring pins why
  // a crash BETWEEN the two must yield a conservative false-drop (rerun
  // re-drops the crashed docs via their own band keys) and never a
  // duplicate landing or a near-dup hole. Three batches of the
  // documents fixture; batch 2 carries re-keyed EXACT COPIES of 1/10 of
  // batch 1's docs, so suppression after the crash can only come
  // through the band keys (the digests append died) — the exact
  // property the ordering buys.

  private def docSlices(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val docs = graft.Tables.documents(spark, sfDir)
    // Slice on the GenScale-span-invariant key (copies shift doc_id by
    // c·10⁷, so doc_id % 10⁷ is copy-invariant): a text's exact mirror
    // copies all land in ONE batch. The naive doc_id % 3 spread every
    // dup group across all three batches at sf10, which left the
    // crashed batch with ZERO survivors and made the crash-window
    // check vacuous — caught by icheck's digest-count assertion.
    val sk = pmod(pmod(col("doc_id"), lit(10000000L)), lit(3))
    val b0 = docs.filter(sk === 0)
    val b1 = docs.filter(sk === 1)
    val copies = docs
      .filter(pmod(pmod(col("doc_id"), lit(10000000L)), lit(30)) === 1)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L))
    val b2 = docs.filter(sk === 2).unionByName(copies)
    (b0, b1, b2)
  }

  private def land(dir: String)(s: DataFrame): Unit =
    s.write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)

  private def runIngest(spark: SparkSession, sfDir: String, workDir: String,
      tag: String, batches: Seq[Int], haltAfterBandsOnLast: Boolean): Unit = {
    import graft.operators.IncrementalDedup
    val (b0, b1, b2) = docSlices(spark, sfDir)
    val all = Seq(b0, b1, b2)
    val state = s"$workDir/istate_$tag"
    val landDir = s"$workDir/iland_$tag"
    batches.zipWithIndex.foreach { case (bi, i) =>
      if (haltAfterBandsOnLast && i == batches.size - 1) {
        IncrementalDedup.afterBandsHook = () => {
          System.err.println(
            "[soak] bands appended, digests NOT — halting JVM")
          Runtime.getRuntime.halt(137)
        }
      }
      IncrementalDedup.ingestWith(spark, all(bi), state)(land(landDir))
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val (mode, sfDir, workDir) = (args(0), args(1), args(2))
    val spark = session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    val src = s"$workDir/source"

    mode match {
      case "prep" =>
        // 32 source files × maxFilesPerTrigger=4 → 8 micro-batches per
        // query: enough batch boundaries for a mid-stream kill to land
        // inside real incremental state
        graft.Tables.events(spark, sfDir).repartition(32)
          .write.mode("overwrite").parquet(src)
        println(s"[soak] prep: 32-file source at $src")

      case "crash" =>
        // halt — not stop() — after a handful of completed batches:
        // in-flight batches die uncommitted, exactly like a lost executor
        spark.streams.addListener(new StreamingQueryListener {
          private val done = new java.util.concurrent.atomic.AtomicInteger
          override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          override def onQueryProgress(
              e: StreamingQueryListener.QueryProgressEvent): Unit = {
            if (e.progress.numInputRows > 0 &&
                done.incrementAndGet() == 5) {
              System.err.println("[soak] 5 data batches done — halting JVM")
              Runtime.getRuntime.halt(137)
            }
          }
        })
        startAll(spark, src, workDir, "run").foreach(_.awaitTermination())
        // reachable only if the fixture drained in <5 batches — that
        // would make the soak vacuous, so fail loudly
        System.err.println("[soak] crash phase drained without halting")
        sys.exit(2)

      case "resume" =>
        startAll(spark, src, workDir, "run").foreach(_.awaitTermination())
        println("[soak] resume: drained to AvailableNow completion")

      case "golden" =>
        startAll(spark, src, workDir, "gold").foreach(_.awaitTermination())
        println("[soak] golden: uninterrupted run complete")

      case "icrash" =>
        // b0 clean, then b1 with the JVM halted between the bands and
        // digests appends (the sink has already landed b1's survivors)
        runIngest(spark, sfDir, workDir, "run", Seq(0, 1),
          haltAfterBandsOnLast = true)
        System.err.println("[soak] icrash phase completed without halting")
        sys.exit(2)

      case "iresume" =>
        // replay b1 (the crashed batch) exactly as a micro-batch retry
        // would, then ingest b2 (which carries the re-keyed copies)
        runIngest(spark, sfDir, workDir, "run", Seq(1, 2),
          haltAfterBandsOnLast = false)
        println("[soak] iresume: replayed b1, ingested b2")

      case "igolden" =>
        runIngest(spark, sfDir, workDir, "gold", Seq(0, 1, 2),
          haltAfterBandsOnLast = false)
        println("[soak] igolden: uninterrupted ingest complete")

      case "icheck" =>
        def ids(p: String) = spark.read
          .parquet(s"$workDir/$p").select("doc_id")
        var failed = false
        def assertEq(name: String, a: Array[String], b: Array[String]):
            Unit =
          if (a.sameElements(b)) println(s"[soak] PASS $name (${a.length})")
          else {
            failed = true
            println(s"[soak] FAIL $name: crash-run=${a.length} " +
              s"golden=${b.length}; only-crash=[${a.diff(b).take(3)
                .mkString("; ")}] only-golden=[${b.diff(a).take(3)
                .mkString("; ")}]")
          }
        // the landed doc set must be EXACTLY the golden one: b1 landed
        // once in the crashed run (sink-before-state), its replay
        // re-dropped via its own bands, nothing lost, nothing doubled
        assertEq("ingest landed crash-vs-golden",
          canon(ids("iland_run")), canon(ids("iland_gold")))
        val dup = spark.read.parquet(s"$workDir/iland_run")
          .groupBy("doc_id").count().filter(col("count") > 1).count()
        if (dup != 0) {
          failed = true
          println(s"[soak] FAIL ingest landed: $dup doc_ids landed twice")
        } else println("[soak] PASS ingest landed exactly-once per doc")
        // the re-keyed exact copies (doc_id >= 1e9) must be suppressed
        // in BOTH runs — in the crash run that suppression can only
        // have come through b1's band keys, because its digests append
        // died with the JVM
        val digests = spark.read
          .parquet(s"$workDir/istate_run/digests").distinct().count()
        val goldDigests = spark.read
          .parquet(s"$workDir/istate_gold/digests").distinct().count()
        val copiesLanded = ids("iland_run")
          .filter(col("doc_id") >= 1000000000L).count()
        if (copiesLanded != 0) {
          failed = true
          println(s"[soak] FAIL copies: $copiesLanded re-keyed exact " +
            "copies landed despite band suppression")
        } else println("[soak] PASS re-keyed copies suppressed")
        if (digests >= goldDigests) {
          failed = true
          println(s"[soak] FAIL crash-window evidence: crash-run digest " +
            s"state ($digests) not smaller than golden ($goldDigests) — " +
            "the kill did not land between the appends")
        } else println(s"[soak] PASS crash window real: digest state " +
          s"$digests < golden $goldDigests (b1's digests died with the " +
          "JVM; suppression held via bands)")
        if (failed) sys.exit(1)
        println("[soak] ALL INGEST CHECKS PASSED")

      case "check" =>
        def read(p: String) = spark.read.parquet(s"$workDir/$p")
        var failed = false
        def assertEq(name: String, a: Array[String], b: Array[String]):
            Unit =
          if (a.sameElements(b)) println(s"[soak] PASS $name (${a.length})")
          else {
            failed = true
            val d1 = a.diff(b).take(3).mkString("; ")
            val d2 = b.diff(a).take(3).mkString("; ")
            println(s"[soak] FAIL $name: crash-run=${a.length} " +
              s"golden=${b.length}; only-crash=[$d1] only-golden=[$d2]")
          }

        // rollup: crash-run state vs golden state vs BATCH recompute
        val rolled = canon(EventStream.rollupState(spark,
          s"$workDir/run/rollup"))
        assertEq("rollup crash-vs-golden", rolled,
          canon(EventStream.rollupState(spark, s"$workDir/gold/rollup")))
        assertEq("rollup crash-vs-batch", rolled,
          canon(graft.operators.Cdc.rollupAgg(
            spark.read.parquet(src).withColumn("day", to_date(col("ts"))),
            Seq("day", "event_type"))))

        // sessions: batch-boundary-independent → row-exact
        assertEq("sessions crash-vs-golden",
          canon(read("run/sessions")), canon(read("gold/sessions")))

        // firstSeen: exactly-once per key, key set == golden == input
        val fsRun = read("run/firstseen")
        val nRows = fsRun.count()
        val nKeys = fsRun.select("k").distinct().count()
        if (nRows != nKeys) {
          failed = true
          println(s"[soak] FAIL firstseen exactly-once: $nRows rows for " +
            s"$nKeys keys")
        } else println(s"[soak] PASS firstseen exactly-once ($nKeys keys)")
        assertEq("firstseen keyset crash-vs-golden",
          canon(fsRun.select("k")), canon(read("gold/firstseen").select("k")))
        assertEq("firstseen keyset vs input",
          canon(fsRun.select("k")),
          canon(pairs(spark.read.parquet(src)).toDF("k", "id")
            .select("k").distinct()))
        // every emitted id must be a real event_id OF that key
        val orphan = fsRun.join(
          pairs(spark.read.parquet(src)).toDF("k", "id"),
          Seq("k", "id"), "left_anti").count()
        if (orphan != 0) {
          failed = true
          println(s"[soak] FAIL firstseen ids: $orphan rows not in input")
        } else println("[soak] PASS firstseen ids subset of input")

        if (failed) sys.exit(1)
        println("[soak] ALL CHECKS PASSED")
    }
    spark.stop()
  }
}
