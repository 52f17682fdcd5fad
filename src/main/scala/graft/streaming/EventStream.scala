package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.Tables

/** Input row for [[EventStream.userSessions]]. */
case class SessEvent(user_id: Long, ts: Timestamp, value: Double)

/** One open session (epoch millis). */
case class SessState(start: Long, last: Long, n: Long, sum: Double)

/** Per-user state for [[EventStream.userSessions]]: every session still
  * open w.r.t. the watermark, kept sorted by start. Bounded: sessions at
  * least `gap` apart inside the watermark horizon H means at most
  * ⌈H/gap⌉ + 1 entries per user (H = 2 h, gap = 30 min → ≤ 5), and keys
  * expire via event-time timeout — state tracks users active inside the
  * watermark, not stream length. */
case class SessBuf(sessions: List[SessState])

/** One closed session emitted by [[EventStream.userSessions]]. */
case class SessionOut(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

/** Structured Streaming slice (SURVEY.md §2.2 "streaming mode"): the
  * events table as a file-source stream, watermarked event-time windows,
  * exactly-once file sink via checkpointing.
  *
  * The window expressions are identical to the batch versions in
  * graft.operators.WindowedQueries — `window`/`session_window` are
  * mode-agnostic, which is the whole point: one definition, two runtimes.
  *
  * The reference's only stream "state" is the latest-feed-hash blob and
  * blob-existence idempotence guards (dags/warsaw-gtfs.py:65-80,
  * dags/warsaw-weather.py:26-28); checkpoint + watermark state subsume
  * both (SURVEY.md §2.2 streaming note). [[userSessions]] adds the
  * custom-state tier — `flatMapGroupsWithState` sessionization with
  * event-time timeouts — for session payloads `session_window` can't
  * express.
  */
object EventStream {

  /** File-source stream with the declared events schema. `maxFilesPerTrigger`
    * bounds micro-batch size — the knob that keeps state/memory flat when
    * replaying a large backlog. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Tables.eventsSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)

  /** Late rows beyond the 2 h watermark are dropped in append mode. */
  def withLateness(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")

  def tumblingCounts(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  def slidingCounts(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"), col("n"))

  def sessionCounts(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sstart"), col("user_id"), col("n"))

  /** EXACT streaming COUNT(DISTINCT user) per tumbling hour — the
    * chained-stateful-operator pattern (Spark ≥3.5): a streaming
    * dropDuplicates on (window, user) makes each user count once per
    * window, then a plain windowed count aggregates the survivors. Both
    * stages evict by the same watermark (the window column carries the
    * event-time), so state is bounded by active-window cardinality — the
    * streaming mirror of batch `q_rolling_active`'s distinct-per-window
    * semantics without any sketch. */
  def tumblingActiveUsers(events: DataFrame): DataFrame =
    withLateness(events)
      .select(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("active_users"))
      .select(col("w.start").as("wstart"), col("active_users"))

  /** Streaming OHLC bars: the batch [[graft.operators.TimeSeries.ohlcBars]]
    * semantics as an incremental windowed aggregation — `min_by`/`max_by`
    * over the `(ts, event_id)` struct are ordinary declarative aggregates,
    * so their partial states (current best + its key) merge across
    * micro-batches like any min/max, and the watermark evicts closed
    * windows. Asserted equal to the batch bars in StreamingSpec. */
  def hourlyOhlc(events: DataFrame): DataFrame =
    withLateness(events)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * escape hatch for session semantics `session_window` can't express
    * (per-session running aggregates beyond count, emit-on-close with
    * arbitrary payload). Gap rule matches `session_window` exactly: an
    * event within ≤ gap of a session extends it; strictly greater starts
    * a new one — [[sessionCounts]] and this operator close identical
    * sessions on identical input, under ANY in-watermark arrival order
    * (asserted in StreamingSpec, including out-of-order cross-batch
    * delivery).
    *
    * State per user is the [[SessBuf]] of still-open sessions — emitted
    * only once the watermark passes `last + gap` (append-mode
    * `session_window` timing), so a late event adjacent to ANY buffered
    * session merges instead of corrupting an already-emitted one. State
    * is bounded by ⌈watermark-horizon/gap⌉ sessions per active user, the
    * property that keeps this runnable on an unbounded stream. */
  def userSessions(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    withLateness(events)
      .select(col("user_id"), col("ts"), col("value"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionize(gapMs))
  }

  /** Per-group transition function for [[userSessions]]: interval-merge
    * the buffered open sessions with the batch's events, then emit
    * exactly the sessions the watermark has passed. Atoms (each event as
    * a 1-point interval, plus every stored session) are sorted by start;
    * an atom starting within ≤ gap of the running interval's end merges
    * into it (start = min via sort order, end = max — an earlier merging
    * event DOES lower `session_start`), anything farther starts a new
    * interval. That is batch `session_window`'s union-of-[t, t+gap] rule,
    * and because ALL still-open sessions stay buffered until the
    * watermark passes `last + gap`, any in-watermark arrival order —
    * including a late event adjacent to an older still-open session —
    * produces the sessions the batch expression would. (This matches
    * streaming `session_window`'s append-mode emission timing, too:
    * nothing is emitted before the watermark proves the session can no
    * longer grow.)
    *
    * The event-time timeout is set to the EARLIEST open close
    * (min(last) + gap, strictly above the current watermark by
    * construction); on timeout the same partition logic emits whatever
    * the advanced watermark has since closed. */
  private def sessionize(gapMs: Long)(userId: Long, rows: Iterator[SessEvent],
      state: GroupState[SessBuf]): Iterator[SessionOut] = {
    def close(s: SessState) = SessionOut(userId, new Timestamp(s.start),
      new Timestamp(s.last), s.n, s.sum)
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    val atoms = (rows.map(e => SessState(e.ts.getTime, e.ts.getTime, 1L, e.value))
      ++ existing).toArray.sortBy(s => (s.start, s.last))
    if (atoms.isEmpty) { state.remove(); return Iterator.empty }
    val merged = scala.collection.mutable.ArrayBuffer.empty[SessState]
    atoms.foreach { a =>
      if (merged.nonEmpty && a.start <= merged.last.last + gapMs) {
        val m = merged.last
        merged(merged.length - 1) = SessState(m.start,
          math.max(m.last, a.last), m.n + a.n, m.sum + a.sum)
      } else merged += a
    }
    val wm = state.getCurrentWatermarkMs()
    // STRICT close: an on-time event at ts == wm can still touch-merge a
    // session whose last + gap == wm (touching windows merge), so the
    // session is only provably closed once last + gap < wm
    val (closed, open) = merged.partition(_.last + gapMs < wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(SessBuf(open.toList))
      // min close can equal wm under the strict rule; Spark requires the
      // timeout strictly above the current watermark
      state.setTimeoutTimestamp(math.max(open.map(_.last).min + gapMs, wm + 1))
    }
    closed.iterator.map(close)
  }

  /** Streaming exact dedup: drops events with a previously-seen
    * `event_id` while bounding state by the watermark — the streaming
    * form of the training-pipeline dedup operators. State per key is one
    * timestamp; keys expire once the watermark passes them. */
  def dedupedStream(events: DataFrame): DataFrame =
    withLateness(events).dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: the streaming side joins a broadcast
    * static dimension — stateless, no watermark interaction; the static
    * side is re-read per micro-batch (picks up dimension updates). */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left_outer")

  /** Stream-stream interval join (attribution shape): each click joins
    * purchases by the same user within the following hour. Both sides
    * carry the 2 h watermark and the join condition bounds event-time
    * distance, so Spark can size the join state buffer and expire rows —
    * the two requirements that make an unbounded stream-stream join
    * runnable. Self-join on one source stream; at scale the two sides are
    * separate topics with the same contract. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = withLateness(events)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = withLateness(events)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  /** LEFT OUTER stream-stream interval join: every click emits — matched
    * rows as they pair, unmatched rows with NULL purchase columns once
    * the watermark proves no in-window purchase can still arrive. The
    * outer semantics are what attribution actually needs (organic
    * conversions must surface, not vanish); Spark requires both
    * watermarks + the event-time range condition so it can both bound
    * the join state AND decide when an unmatched buffered click is
    * safely emittable. */
  def clickPurchaseJoinOuter(events: DataFrame): DataFrame = {
    val clicks = withLateness(events)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    val purchases = withLateness(events)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  /** foreachBatch sink with dynamic-partition-overwrite upsert: each
    * micro-batch overwrites exactly the date partitions it touches —
    * idempotent under micro-batch replay (the foreachBatch escape hatch
    * for sinks without native exactly-once, e.g. JDBC/object stores). */
  def runForeachBatchUpsert(spark: SparkSession, srcDir: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    tumblingCounts(readEvents(spark, srcDir)).writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.withColumn("d", to_date(col("wstart")))
          .write.mode("overwrite").partitionBy("d").parquet(outDir)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Batch-equivalent one-shot run: AvailableNow trigger + checkpoint →
    * restarts resume exactly-once from the checkpoint (P10's idempotence,
    * done properly). */
  def runTumblingAvailableNow(spark: SparkSession, srcDir: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    tumblingCounts(readEvents(spark, srcDir)).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming count-min sketch state: each micro-batch lands ITS OWN
    * cells ([[graft.operators.AggQueries.cmsCells]]) under
    * `cellsPath/batch=<id>` — the mergeable-sketch warehouse shape
    * driven from a stream. Batch-keyed OVERWRITE makes crash replay
    * idempotent: re-running a micro-batch rebuilds byte-identical cells
    * (the sketch is a deterministic fold of the batch) over the same
    * directory, where a plain append would double-count the replayed
    * events. Readers never rescan raw events: [[cmsStateEstimates]]
    * re-sums ≤ depth·width cell rows per landed batch. `key` is a
    * column expression over the stream's schema (e.g.
    * `col("event_type")`). */
  def streamCmsCells(events: DataFrame, key: org.apache.spark.sql.Column,
      cellsPath: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.AggQueries.cmsCells(batch.toDF(), key)
          .write.mode("overwrite").parquet(s"$cellsPath/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming incremental rollup maintenance — the stream form of
    * [[graft.operators.Cdc.rollupMaintain]], on the same batch-keyed
    * state design as [[streamCmsCells]]: each micro-batch lands its
    * per-(day, event_type) DECIMAL partials under `path/batch=<id>`
    * (OVERWRITE → crash replay rebuilds byte-identical partials instead
    * of double-counting), and [[rollupState]] re-sums the partials on
    * read. Decimal sums are exact and associative, so the rolled-up
    * state is bit-identical to a batch recompute over every event the
    * stream has delivered — rollup freshness costs |batch| rows per
    * trigger, never an events rescan. */
  def streamRollupPartials(events: DataFrame, path: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the ONE shared rollup-partial definition (Cdc.rollupAgg) —
        // bit-parity with the batch path is structural, not coincidental
        graft.operators.Cdc.rollupAgg(
          batch.toDF().withColumn("day", to_date(col("ts"))),
          Seq("day", "event_type"))
          .write.mode("overwrite").parquet(s"$path/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      // default: continuous micro-batching (the long-lived service
      // shape); pass Trigger.AvailableNow() for drain-and-stop runs
      // (the StreamSoak crash-recovery gate) — without it
      // awaitTermination never returns on a bounded backlog
      .trigger(trigger)
      .start()

  /** Current rollup: re-sum the landed per-batch partials. A reader
    * racing the very first micro-batch sees an empty rollup (correct:
    * nothing has been delivered), not a missing-path error. */
  def rollupState(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("day", DateType), StructField("event_type", StringType),
      StructField("n", LongType),
      StructField("s", graft.operators.Cdc.rollupDec)))
    val partials =
      try spark.read.schema(schema).parquet(path)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    partials.groupBy("day", "event_type")
      .agg(sum(col("n")).as("n"),
        sum(col("s")).cast(graft.operators.Cdc.rollupDec).as("s"))
  }

  /** Merged point estimates over every cell batch at `cellsPath`:
    * union + re-sum per (r, b) IS the CMS merge, then the usual
    * min-probe — so a dashboard refresh after each micro-batch costs
    * cell-table rows, not an events rescan. */
  def cmsStateEstimates(spark: SparkSession, cellsPath: String,
      keys: DataFrame): DataFrame =
    graft.operators.AggQueries.cmsEstimates(
      spark.read.parquet(cellsPath)
        .groupBy("r", "b").agg(sum(col("n")).as("n")),
      keys)
}
