package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Timer-driven streaming sessionization on `transformWithState` — the
  * EVENT-TIME-TIMER tier of the arbitrary-state API ([[FirstSeen]]
  * exercises plain keyed state; this adds `registerTimer` /
  * `handleExpiredTimer`). A session closes `gapMs` after its last
  * event AS MEASURED BY THE WATERMARK, not by any batch boundary: each
  * input row re-arms the key's single timer at `last + gapMs`, and
  * when the watermark passes that mark the expiry callback emits the
  * closed session and clears the state. Compare
  * [[EventStream.userSessions]] (flatMapGroupsWithState +
  * GroupStateTimeout): same semantics, previous-generation API —
  * keeping both pins the migration equivalence.
  *
  * Scale shape: state is one (start, last, n, sum) record + one timer
  * per ACTIVE key, RocksDB-backed; expired keys leave the store, so
  * steady-state size tracks concurrent sessions, not history. */
object SessionTimeout {

  /** (user_id, session_start, session_end, n_events, sum_value). */
  type SessionRow = (Long, Timestamp, Timestamp, Long, Double)

  /** Keyed session accumulator: (startMs, lastMs, n, sum). */
  private type Acc = (Long, Long, Long, Double)

  class Processor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Timestamp, Double), SessionRow] {
    @transient private var acc: ValueState[Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[Acc]("acc",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaDouble), TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Timestamp, Double)],
        timerValues: TimerValues): Iterator[SessionRow] = {
      // Split on INPUT whenever the gap is visible in the data: a new
      // event past last+gap closes the open session immediately (a
      // timer can only fire once the WATERMARK passes the horizon —
      // by then a late-window event may already have arrived, and a
      // retroactive split would need the closed session back). Timers
      // handle the one case input cannot: the TRAILING session, whose
      // closing event never comes.
      var (start, last, n, sum) =
        if (acc.exists()) acc.get() else (Long.MaxValue, Long.MinValue, 0L, 0.0)
      val hadState = acc.exists()
      val closed = scala.collection.mutable.ArrayBuffer[SessionRow]()
      rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts, v) =>
        val ms = ts.getTime
        if (n > 0 && ms > last + gapMs) {
          closed += ((key, new Timestamp(start), new Timestamp(last), n, sum))
          start = Long.MaxValue; last = Long.MinValue; n = 0L; sum = 0.0
        }
        start = math.min(start, ms)
        last = math.max(last, ms)
        n += 1
        sum += v
      }
      acc.update((start, last, n, sum))
      // one armed timer per key: re-arm at the new session horizon
      // (materialize before deleting — the iterator is store-backed)
      if (hadState) getHandle.listTimers().toList.foreach(t =>
        getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(last + gapMs)
      closed.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionRow] = {
      val out =
        if (acc.exists()) {
          val (start, last, n, sum) = acc.get()
          Iterator.single((key, new Timestamp(start), new Timestamp(last),
            n, sum))
        } else Iterator.empty
      acc.clear()
      out
    }
  }

  /** Wire a (user_id, ts, value) stream (watermark already applied by
    * the caller) through the timer sessionizer. */
  def sessions(events: Dataset[(Long, Timestamp, Double)],
      gapMs: Long): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new Processor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
