package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Trend extraction over the event stream: bounded-tap exponential
  * smoothing, rolling z-score anomaly flags, and hour-of-day seasonal
  * residuals — the monitoring layer a pipeline puts on its own volume
  * counters.
  *
  * Reference basis: the reference samples delay snapshots on a timer
  * and leaves smoothing/anomaly judgment to the humans reading the
  * dashboards (`dags/warsaw-delays.py:186-187` stamps `Timestamp` =
  * now and uploads); these queries are that judgment, made declarative.
  *
  * Exactness: EWMA uses dyadic weights (α = 1/2, 8 taps), so numerator
  * and denominator are exact integers; the anomaly test cross-multiplies
  * the z² inequality `(n·x − S)² > z²·(n·Q − S²)` so no division or
  * sqrt ever happens; seasonal residuals are ppm-scaled integer
  * cross-multiplications. Products ride decimal(19,0)-cast operands
  * (the [[TimeSeries.autocorr]] convention) so petabyte daily volumes
  * cannot wrap a Long; DuckDB mirrors with HUGEINT casts.
  *
  * Scale shape: one map-side-combinable rollup collapses the raw stream
  * to |series|×|days| (or ×24) rows; every window after that partitions
  * by event_type (or hour), never globally, and is calendar-bounded.
  */
object TrendOps {

  type Q = (SparkSession, String) => DataFrame

  private def dec(c: Column) = c.cast("decimal(19,0)")

  private def dailyByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))

  /** 8-tap dyadic EWMA of daily volume per series: weights 128, 64, …,
    * 1 over the last 8 OBSERVED days (row-based taps — a day with zero
    * events produces no row, so the taps skip calendar gaps; join a
    * calendar spine first, as [[GeneratorOps.qGeneratorSequence]]
    * builds, when strict calendar-day smoothing is required),
    * renormalized over the taps actually present, emitted as exact
    * ppm. Seven `lag`s share one window sort — Catalyst evaluates them
    * in a single Window operator. */
  val qTsEwma: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    val lags = (1 to 7).map(k => lag(col("x"), k).over(w).as(s"l_$k"))
    val base = dailyByType(s, d).select(
      col("event_type") +: col("day") +: col("x") +: lags: _*)
    val num = (1 to 7).foldLeft(col("x") * lit(128L)) { (acc, k) =>
      acc + coalesce(col(s"l_$k"), lit(0L)) * lit(1L << (7 - k))
    }
    val den = (1 to 7).foldLeft(lit(128L)) { (acc, k) =>
      acc + when(col(s"l_$k").isNotNull, lit(1L << (7 - k))).otherwise(lit(0L))
    }
    base
      .withColumn("num", dec(num))
      .withColumn("den", den)
      .select(col("event_type"), col("day"), col("x"),
        expr("CAST((num * 1000000) div den AS LONG)").as("ewma_ppm"))
  }

  /** Rolling z-score anomaly flags: a day is anomalous when its volume
    * sits more than 2σ from the mean of its series' trailing 15
    * OBSERVED days (row frame — calendar gaps stretch the lookback;
    * spine-join first for strict calendar windows, as with
    * [[qTsEwma]]).
    * The test is the cross-multiplied integer inequality
    * `(n·x − S)² > 4·(n·Q − S²)` — no float mean/stddev anywhere. */
  val qTsAnomaly: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-14, 0)
    val scored = dailyByType(s, d)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("x")).over(w))
      .withColumn("q", sum(dec(col("x")) * dec(col("x"))).over(w))
    val lhs = {
      val c = dec(col("n")) * dec(col("x")) - dec(col("s"))
      c * c
    }
    val rhs = lit(4) * (dec(col("n")) * col("q") - dec(col("s")) * dec(col("s")))
    scored
      .filter(col("n") >= 8)
      .select(col("event_type"), col("day"), col("x"), col("n"),
        (lhs > rhs).as("anomaly"))
  }

  /** Hour-of-day deseasonalization: per (day, hour) volume minus the
    * hour's mean across days, as the exact ppm integer
    * `(x·D − S)·10⁶ div D`. The residual series is what downstream
    * anomaly logic should consume when traffic has a daily shape. */
  val qTsSeasonal: Q = (s, d) => {
    val byDH = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("x"))
    val wh = Window.partitionBy("hr")
    byDH
      .withColumn("s_h", sum(col("x")).over(wh))
      .withColumn("d_h", count(lit(1)).over(wh))
      .withColumn("num",
        (dec(col("x")) * dec(col("d_h")) - dec(col("s_h"))) * lit(1000000))
      .select(col("day"), col("hr"), col("x"),
        expr("CAST(num div d_h AS LONG)").as("resid_ppm"))
  }

  /** Two-factor (ISO-weekday × hour) additive decomposition of the
    * traffic grid — the interaction view beyond [[qTsSeasonal]] (hour
    * only) and the weekday share profile: per grid cell,
    * `resid = x − rowmean(dow) − colmean(hour) + grandmean`, every term
    * an exact ppm integer (`S·10⁶ div D` over window sums of the 7×24
    * cell grid). A large |resid| marks a (dow, hour) cell the two
    * marginal profiles cannot explain — e.g. a Monday-9am-only spike.
    * All three windows run over the 168-row grid, never the stream. */
  val qTwoWayProfile: Q = (s, d) => {
    val grid = Tables.events(s, d)
      .select((pmod(dayofweek(col("ts")) + 5, lit(7)) + 1)
        .cast("int").as("iso_dow"), hour(col("ts")).as("hr"))
      .groupBy(col("iso_dow"), col("hr"))
      .agg(count(lit(1)).as("x"))
    val wr = Window.partitionBy("iso_dow")
    val wc = Window.partitionBy("hr")
    val wg = Window.partitionBy()
    grid
      .withColumn("sr", sum(col("x")).over(wr))
      .withColumn("dr", count(lit(1)).over(wr))
      .withColumn("sc", sum(col("x")).over(wc))
      .withColumn("dc", count(lit(1)).over(wc))
      .withColumn("sg", sum(col("x")).over(wg))
      .withColumn("dg", count(lit(1)).over(wg))
      // ppm products ride decimal(19,0) like qTsSeasonal's, so extreme
      // per-cell counts widen instead of overflowing Long under ANSI;
      // the oracle's HUGEINT side needs no change. `div` still yields
      // BIGINT per term, so the output schema is unchanged.
      .withColumn("xd", dec(col("x")) * lit(1000000))
      .withColumn("srd", dec(col("sr")) * lit(1000000))
      .withColumn("scd", dec(col("sc")) * lit(1000000))
      .withColumn("sgd", dec(col("sg")) * lit(1000000))
      .select(col("iso_dow"), col("hr"), col("x"),
        expr("""CAST(xd - (srd div dr)
                - (scd div dc) + (sgd div dg) AS LONG)""")
          .as("resid_ppm"))
  }

  /** Rolling robust level: doubled-scale EXACT median of each series'
    * trailing 15 observed days (the robust complement of [[qTsAnomaly]]'s
    * mean/variance — a one-day spike moves this not at all). `med2 =
    * 2·median` of integers is an integer-valued double in both engines
    * (the [[Outliers]] device), windowed over the daily rollup only. */
  val qTsRollingMedian: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-14, 0)
    dailyByType(s, d)
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("med2",
        (percentile(col("x"), lit(0.5)).over(w) * 2).cast("long"))
      .filter(col("n_win") >= 8)
      .select(col("event_type"), col("day"), col("x"), col("n_win"),
        col("med2"))
  }

  val queries: Map[String, Q] = Map(
    "q_ts_ewma" -> qTsEwma,
    "q_ts_anomaly" -> qTsAnomaly,
    "q_two_way_profile" -> qTwoWayProfile,
    "q_ts_rolling_median" -> qTsRollingMedian,
    "q_ts_seasonal" -> qTsSeasonal)

  val oracleSql: Map[String, String] = Map(
    "q_ts_rolling_median" ->
      """WITH dsum AS (
           SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, x, CAST(n_win AS BIGINT) AS n_win,
           CAST(med2 AS BIGINT) AS med2
         FROM (
           SELECT event_type, day, x,
             COUNT(*) OVER w AS n_win,
             quantile_cont(x, 0.5) OVER w * 2 AS med2
           FROM dsum
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
         WHERE n_win >= 8""",
    "q_two_way_profile" ->
      """WITH g AS (
           SELECT CAST(((dayofweek(ts) + 6) % 7) + 1 AS INT) AS iso_dow,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2)
         SELECT iso_dow, hr, x,
           CAST(CAST(x AS HUGEINT) * 1000000
             - (CAST(SUM(x) OVER (PARTITION BY iso_dow) AS HUGEINT)
                * 1000000 // COUNT(*) OVER (PARTITION BY iso_dow))
             - (CAST(SUM(x) OVER (PARTITION BY hr) AS HUGEINT)
                * 1000000 // COUNT(*) OVER (PARTITION BY hr))
             + (CAST(SUM(x) OVER () AS HUGEINT)
                * 1000000 // COUNT(*) OVER ()) AS BIGINT) AS resid_ppm
         FROM g""",
    "q_ts_ewma" ->
      """WITH dsum AS (
           SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
         l AS (
           SELECT event_type, day, x,
             lag(x, 1) OVER w AS l_1, lag(x, 2) OVER w AS l_2,
             lag(x, 3) OVER w AS l_3, lag(x, 4) OVER w AS l_4,
             lag(x, 5) OVER w AS l_5, lag(x, 6) OVER w AS l_6,
             lag(x, 7) OVER w AS l_7
           FROM dsum
           WINDOW w AS (PARTITION BY event_type ORDER BY day))
         SELECT event_type, day, x,
           CAST((CAST(x * 128 + COALESCE(l_1, 0) * 64
               + COALESCE(l_2, 0) * 32 + COALESCE(l_3, 0) * 16
               + COALESCE(l_4, 0) * 8 + COALESCE(l_5, 0) * 4
               + COALESCE(l_6, 0) * 2 + COALESCE(l_7, 0) AS HUGEINT)
               * 1000000)
             // (128 + CASE WHEN l_1 IS NULL THEN 0 ELSE 64 END
               + CASE WHEN l_2 IS NULL THEN 0 ELSE 32 END
               + CASE WHEN l_3 IS NULL THEN 0 ELSE 16 END
               + CASE WHEN l_4 IS NULL THEN 0 ELSE 8 END
               + CASE WHEN l_5 IS NULL THEN 0 ELSE 4 END
               + CASE WHEN l_6 IS NULL THEN 0 ELSE 2 END
               + CASE WHEN l_7 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS ewma_ppm
         FROM l""",
    "q_ts_anomaly" ->
      """WITH dsum AS (
           SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT event_type, day, x,
             COUNT(*) OVER w AS n, SUM(x) OVER w AS s,
             SUM(CAST(x AS HUGEINT) * x) OVER w AS q
           FROM dsum
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
         SELECT event_type, day, x, CAST(n AS BIGINT) AS n,
           (CAST(n AS HUGEINT) * x - s) * (CAST(n AS HUGEINT) * x - s)
             > 4 * (CAST(n AS HUGEINT) * q - CAST(s AS HUGEINT) * s)
             AS anomaly
         FROM r WHERE n >= 8""",
    "q_ts_seasonal" ->
      """WITH dh AS (
           SELECT CAST(ts AS DATE) AS day,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hr, COUNT(*) AS x
           FROM events GROUP BY 1, 2)
         SELECT day, hr, x,
           CAST(((CAST(x AS HUGEINT) * COUNT(*) OVER wh - SUM(x) OVER wh)
               * 1000000) // COUNT(*) OVER wh AS BIGINT) AS resid_ppm
         FROM dh
         WINDOW wh AS (PARTITION BY hr)""")
}
