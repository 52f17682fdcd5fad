package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Cross-micro-batch streaming exact dedup on `transformWithState` —
  * Spark 4's arbitrary-state API (the `flatMapGroupsWithState`
  * successor: explicit named state cells, per-state TTL, RocksDB-backed
  * and changelog-checkpointed). This is the state-store twin of
  * [[graft.operators.IncrementalDedup.streamIngest]]'s parquet-state
  * path: state here lives in the streaming state store (compact,
  * per-key point lookups, TTL-evictable), which fits bounded dedup
  * horizons; the parquet-state path fits unbounded corpus identity that
  * batch jobs must share. A digest is keyed state; the FIRST occurrence
  * ever seen is emitted with the batch-min id (deterministic under any
  * intra-batch row order), and every later occurrence — same batch or
  * any later one — is suppressed.
  *
  * Requires the RocksDB state-store provider (set by [[firstSeen]]'s
  * caller/test via `spark.sql.streaming.stateStore.providerClass`) —
  * transformWithState does not run on the default HDFS-backed store.
  */
object FirstSeen {

  /** (digest, id) → first-seen (digest, id) stream, Append mode. */
  class Processor extends StatefulProcessor[String, (String, Long), (String, Long)] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[(String, Long)] =
      if (seen.exists()) {
        Iterator.empty // dup of a prior batch — state survives batches
      } else {
        seen.update(true)
        Iterator.single((key, rows.map(_._2).min)) // batch-min id: deterministic
      }
  }

  /** Wire a (digest, id) stream through the processor. */
  def firstSeen(pairs: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }

  /** [[Processor]] with a bounded dedup horizon: the `seen` cell carries
    * a processing-time TTL, so a digest whose FIRST occurrence is older
    * than `ttl` is evicted from the store and its next occurrence
    * re-emits as a fresh first-seen. Dup suppression does NOT refresh
    * the clock — the horizon is "within `ttl` of the first emission",
    * which keeps re-emission cadence independent of dup arrival rate
    * (and state size proportional to distinct digests inside one
    * horizon, the property that makes TTL dedup viable at 100 TB where
    * unbounded digest state would grow without limit). */
  class TtlProcessor(ttl: java.time.Duration)
      extends StatefulProcessor[String, (String, Long), (String, Long)] {
    @transient private var seen: ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        Encoders.scalaBoolean, TTLConfig(ttl))

    override def handleInputRows(key: String,
        rows: Iterator[(String, Long)],
        timerValues: TimerValues): Iterator[(String, Long)] =
      // an expired value reads as absent, so eviction and first-contact
      // take the same branch
      if (seen.exists()) Iterator.empty
      else {
        seen.update(true)
        Iterator.single((key, rows.map(_._2).min))
      }
  }

  /** [[firstSeen]] with a TTL-bounded horizon — requires
    * `TimeMode.ProcessingTime` (state TTL is processing-time-based). */
  def firstSeenWithTtl(pairs: Dataset[(String, Long)],
      ttl: java.time.Duration): Dataset[(String, Long)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .transformWithState(new TtlProcessor(ttl), TimeMode.ProcessingTime(),
        OutputMode.Append())
  }
}
