package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.Tables

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
  * both (SURVEY.md §2.2 streaming note). `mapGroupsWithState` is
  * deliberately out of v1 — session windows cover the one stateful
  * pattern.
  */
object EventStream {

  /** File-source stream with the declared events schema. `maxFilesPerTrigger`
    * bounds micro-batch size — the knob that keeps state/memory flat when
    * replaying a large backlog. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(Tables.eventsRawSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

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
}
