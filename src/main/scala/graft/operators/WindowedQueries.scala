package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time windowed aggregations in batch mode (SURVEY.md §2.2). The
  * exact same expressions run under Structured Streaming in
  * graft.streaming.EventStream — `window`/`session_window` are
  * mode-agnostic.
  *
  * Timestamps are emitted as formatted strings, never raw TIMESTAMP
  * columns: parquet timestamp physical types differ between engines
  * (Spark µs vs DuckDB ns-derived), strings are representation-proof.
  */
object WindowedQueries {

  type Q = (SparkSession, String) => DataFrame

  private val fmtMin = "yyyy-MM-dd HH:mm"
  private val fmtUs = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  /** 1-hour tumbling windows per event_type — the reference's hourly
    * snapshot cadence (dags/warsaw-delays.py:21, dags/warsaw-weather.py:12). */
  val qWindowTumbling: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), fmtMin).as("wstart"),
        col("event_type"), col("n"))

  /** 1-hour windows sliding every 30 minutes. Spark aligns windows to the
    * epoch; the oracle reproduces that with a 30-min time_bucket and its
    * 30-min-earlier twin (each event belongs to exactly 2 windows). */
  val qWindowSliding: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("window.start"), fmtMin).as("wstart"),
        col("event_type"), col("n"))

  /** Per-user session windows with a 30-minute inactivity gap: count and
    * span per session. Reference basis: the scrape session with
    * inactivity-bounded paging (dags/warsaw-delays.py:114-179).
    * Spark merges *touching* session windows: an event at exactly
    * prev_ts + gap still extends the session (verified by
    * EdgeSpec."session_window boundary"), so the gaps-and-islands oracle
    * flags a new session only when `ts - prev_ts > 30 min` — strictly
    * greater. */
  val qWindowSession: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("span_us"))
      .select(col("user_id"),
        date_format(col("session_window.start"), fmtUs).as("sstart"),
        col("n"), col("span_us"))

  /** Session health rollup: per session-start day, session count,
    * single-event ("bounce") sessions as an exact ppm, and the decimal
    * mean session length — the operational digest on top of the
    * [[qWindowSession]] sessionization (one extra day-keyed aggregate
    * over the session-grain table; the heavy work is the same
    * session_window pass). */
  val qSessionStats: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(to_date(col("session_window.start")).as("day"), col("n"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_bounce"),
        sum(col("n").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("n_events_dec"))
      .select(col("day"), col("n_sessions"),
        expr("n_bounce * 1000000 div n_sessions").as("bounce_ppm"),
        (col("n_events_dec") / col("n_sessions"))
          .cast("decimal(18,6)").cast("double").as("avg_events"))

  /** Resample to a dense hourly grid with zero gap-fill: the canonical
    * consumer query of hourly snapshot feeds (a missing delays-HH.csv
    * hour must read as 0, not vanish — dags/warsaw-delays.py:194). Grid =
    * sequence(min hour, max hour) × distinct event types, left-joined to
    * the actual counts. The grid explode is O(hours × types) — tiny next
    * to the data at any scale. */
  val qResampleGapfill: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val grid = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(ev.select(col("event_type")).distinct())
    grid.join(counts, Seq("h", "event_type"), "left_outer")
      .select(date_format(col("h"), fmtMin).as("hour"), col("event_type"),
        coalesce(col("cnt"), lit(0L)).as("n"))
  }

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_window_tumbling" -> qWindowTumbling,
    "q_window_sliding" -> qWindowSliding,
    "q_window_session" -> qWindowSession,
    "q_session_stats" -> qSessionStats,
    "q_resample_gapfill" -> qResampleGapfill)

  val oracleSql: Map[String, String] = Map(
    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS wstart,
           event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_window_sliding" ->
      """SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS wstart, event_type,
           COUNT(*) AS n
         FROM (SELECT unnest([b30, b30 - INTERVAL 30 MINUTE]) AS wstart,
                 event_type
               FROM (SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b30,
                       event_type FROM events))
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_resample_gapfill" ->
      """WITH bounds AS (
           SELECT date_trunc('hour', MIN(ts)) AS h0,
                  date_trunc('hour', MAX(ts)) AS h1 FROM events),
         grid AS (
           SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
           FROM bounds),
         types AS (SELECT DISTINCT event_type FROM events),
         counts AS (
           SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS cnt
           FROM events GROUP BY 1, 2)
         SELECT strftime(g.h, '%Y-%m-%d %H:%M') AS hour,
           t.event_type AS event_type,
           COALESCE(c.cnt, 0) AS n
         FROM grid g CROSS JOIN types t
         LEFT JOIN counts c ON c.h = g.h AND c.event_type = t.event_type
         ORDER BY hour, t.event_type""",
    "q_session_stats" ->
      """WITH sess AS (
           SELECT user_id, sid, MIN(ts) AS sstart, COUNT(*) AS n
           FROM (SELECT user_id, ts,
                   SUM(new_session) OVER
                     (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                 FROM (SELECT user_id, ts, event_id,
                         CASE WHEN ts - LAG(ts) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE
                           THEN 1 ELSE 0 END AS new_session
                       FROM events))
           GROUP BY user_id, sid)
         SELECT CAST(sstart AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000
             // COUNT(*) AS BIGINT) AS bounce_ppm,
           CAST(CAST(CAST(SUM(CAST(n AS DECIMAL(18,2))) AS DECIMAL(18,2))
             / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE) AS avg_events
         FROM sess GROUP BY CAST(sstart AS DATE) ORDER BY day""",
    "q_window_session" ->
      """SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sstart,
           COUNT(*) AS n,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us
         FROM (SELECT user_id, ts,
                 SUM(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM (SELECT user_id, ts, event_id,
                       CASE WHEN ts - LAG(ts) OVER
                           (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS new_session
                     FROM events))
         GROUP BY user_id, sid ORDER BY user_id, sstart""")
}
