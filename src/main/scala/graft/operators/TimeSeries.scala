package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series repair: forward-fill (last observation carried forward) of
  * sparse readings per entity — the companion to `q_resample_gapfill`'s
  * dense-grid zero fill. The reference's hourly scrape series
  * (`dags/warsaw-delays.py:182,186`) has exactly this shape: a reading
  * only when the scraper saw one, consumers want the latest-known value
  * on every row.
  *
  * Scale shape: `last(x, ignoreNulls)` over an unbounded-preceding row
  * frame is a single window shuffle on the entity key and a running
  * single-slot state per partition — no self-join, no explode, linear in
  * rows regardless of gap length.
  */
object TimeSeries {

  /** Per-key forward fill of `valueCol` ordered by `tsCol` (+ tiebreak). */
  def fillForward(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_filled",
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: derive a deterministic sparse reading (only every
    * 3rd event carries one) and forward-fill it per user over time. */
  val qFillForward: Q = (s, d) =>
    fillForward(
      Tables.events(s, d)
        .withColumn("reading",
          when(col("event_id") % 3 === 0, col("value"))),
      Seq("user_id"), "ts", Seq("event_id"), "reading")
      .select(col("event_id"), col("user_id"), col("reading"),
        col("reading_filled"))

  /** Trailing-window distinct aggregation: per day, distinct active users
    * over the trailing `windowDays` days. Sliding distinct counts have no
    * per-row running state (you can't subtract from a distinct set), so
    * the scalable shape is cover-set expansion: each event contributes to
    * the `windowDays` window-end days it falls inside — a map-side
    * explode with factor = windowDays — then ONE hash aggregation on
    * (day, user) cardinality. No self-join, no window re-scan per day. */
  def rollingActiveUsers(events: DataFrame, windowDays: Int): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .select(explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("wday"), col("user_id"))
      .groupBy("wday")
      .agg(countDistinct("user_id").as("active_users"),
        count(lit(1)).as("n_events"))

  /** Declared query: 7-day trailing active users. */
  val qRollingActive: Q = (s, d) =>
    rollingActiveUsers(Tables.events(s, d), windowDays = 7)

  /** OHLC bar resampling: per (series, hour) the opening/closing values
    * (first/last by event time, event_id tiebreak) plus high/low/count —
    * the downsampling shape every metrics store runs over raw readings
    * (the reference's scraped delay series at hourly grain,
    * `dags/warsaw-delays.py:182`).
    *
    * Scale shape: a SINGLE hash aggregation — `min_by`/`max_by` over the
    * `(ts, event_id)` struct are selection aggregates (map-side
    * combinable, O(1) state), so no window, no self-join, and the result
    * is exact: selections pick existing doubles rather than folding them,
    * so partitioning cannot perturb the output. */
  def ohlcBars(events: DataFrame, seriesCol: String): DataFrame =
    events
      .select(col(seriesCol), date_trunc("hour", col("ts")).as("hr"),
        col("ts"), col("event_id"), col("value"))
      .groupBy(col(seriesCol), col("hr"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))

  /** Declared query: hourly OHLC bars per event_type. */
  val qResampleOhlc: Q = (s, d) =>
    ohlcBars(Tables.events(s, d), "event_type")
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm").as("hr"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Interval-overlap sweep: maximum concurrency per day of the
    * closed-open activity intervals [ts, ts + holdSeconds) each event
    * opens — the occupancy/overlap-counting operator class (concurrent
    * sessions, peak vehicle load, resource saturation) the windowed
    * aggregates can't express. The classic sweep line, made relational:
    * every interval contributes a +1 point at its start and a −1 point
    * at its (day-clipped) end, a running sum over the ordered points IS
    * the concurrency curve, and a per-day max folds it. Ends sort before
    * starts at the same instant (`delta` ascending) so closed-open
    * touching intervals never count as overlapping; `event_id` completes
    * the total order.
    *
    * Scale shape: one union (map-side), ONE day-keyed window shuffle with
    * O(1) running state, one same-key aggregate — the day partition
    * bounds window state the way every other trace operator here bounds
    * it by user. Intervals are clipped to their start day, so each day's
    * curve is self-contained (no cross-partition carry); a multi-day
    * occupancy variant would seed each day with the carried-in count. */
  def concurrencySweep(events: DataFrame, holdSeconds: Int): DataFrame = {
    val day = to_date(col("ts"))
    val opens = events.select(day.as("day"), col("ts").as("pt"),
      lit(1).as("delta"), col("event_id"))
    val closes = events.select(day.as("day"),
      least(col("ts") + expr(s"INTERVAL $holdSeconds SECOND"),
        to_timestamp(date_add(day, 1))).as("pt"),
      lit(-1).as("delta"), col("event_id"))
    val w = Window.partitionBy("day")
      .orderBy(col("pt"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    opens.unionByName(closes)
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy("day")
      .agg(max(col("conc")).as("max_concurrent"),
        count(when(col("delta") === 1, 1)).as("n_events"))
  }

  /** Declared query: peak concurrent 5-minute activity windows per day. */
  val qConcurrencySweep: Q = (s, d) =>
    concurrencySweep(Tables.events(s, d), holdSeconds = 300)

  /** Sample autocorrelation of the daily event-count series at the given
    * lags — the seasonality probe (lag 1 = day-over-day persistence,
    * lag 7 = weekly cycle) a load-forecasting consumer runs over the
    * reference's hourly landing series (dags/warsaw-delays.py:182,186).
    *
    * Exactness: with N = #days and S = Σx, the mean-centered residual
    * x_t − S/N is rational, so we cross-multiply — c_t = N·x_t − S is an
    * exact integer, r_k = Σ c_t·c_{t−k} / Σ c_t² needs only integer
    * sums and ONE final IEEE divide (§7.4). The c_t·c products are
    * accumulated as DecimalType(38,0) (operands cast to decimal(19,0)
    * BEFORE the multiply) because at ~1e9 events/day c² exceeds
    * Long.MaxValue; the oracle mirrors with HUGEINT casts, so the
    * cross-engine parity survives petabyte-scale counts. Scale shape: aggregate
    * first — the event table collapses to |days| rows in one keyed
    * map-side-combinable aggregate; the global-order lag windows and
    * the final fold run on that calendar-bounded series, so the
    * single-partition window holds ≤ a few thousand rows no matter how
    * many events fed it. */
  def autocorr(events: DataFrame, lags: Seq[Int]): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    // N and S ride the SAME single-partition ordered window as the lags
    // (full frame), so no 1-row scalar join enters the plan and the final
    // global fold finds its input already single-partition — the whole
    // post-aggregate tail is one exchange.
    val w = Window.orderBy("day")
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val centered = daily
      .withColumn("n_days", count(lit(1)).over(full))
      .withColumn("s", sum(col("x")).over(full))
      .withColumn("c", col("n_days") * col("x") - col("s"))
    val lagged = lags.foldLeft(centered) { (df, k) =>
      df.withColumn(s"c_$k", lag(col("c"), k).over(w))
    }
    // sum(c*c_k) skips the k NULL lead-in rows; den spans the full series.
    // Operands cast to decimal(19,0) before the multiply so the product
    // (decimal(38,0)) never wraps a Long at 100 TB daily volumes.
    val cDec = col("c").cast("decimal(19,0)")
    val folded = lagged.agg(
      first(col("n_days")).as("n_days"),
      sum(cDec * cDec).as("den"),
      array(lags.map(k =>
        struct(lit(k).as("lag"),
          sum(cDec * col(s"c_$k").cast("decimal(19,0)")).as("num"))): _*)
        .as("nums"))
    folded
      .select(col("n_days"), col("den"), explode(col("nums")).as("e"))
      .select(col("e.lag").as("lag"), col("n_days"),
        (col("e.num").cast("double") / col("den").cast("double"))
          .as("autocorr"))
  }

  /** Declared query: lag-1 and lag-7 autocorrelation of daily volume. */
  val qAutocorr: Q = (s, d) => autocorr(Tables.events(s, d), Seq(1, 7))

  /** CUSUM changepoint detection per series: the day where the
    * cumulative deviation from the series mean peaks — the standard
    * single-changepoint estimator (argmax_i |Σ_{j≤i}(x_j − x̄)|).
    * Exactness: with N days and total S, the scaled statistic
    * `cusum_i = N·cum_i − i·S` is an exact integer (the mean-centered
    * partial sum cross-multiplied by N, same device as [[autocorr]]);
    * operands cast to decimal(19,0) before the multiply so petabyte
    * daily volumes can't wrap a Long, and the argmax tiebreak is the
    * earliest day. Scale shape: one keyed map-side-combinable rollup
    * collapses the event stream to |series|·|days| rows; every window
    * after that partitions by event_type over the calendar-bounded
    * series. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column) = c.cast("decimal(19,0)")
    val scored = daily
      .withColumn("n_days", count(lit(1)).over(full))
      .withColumn("s", sum(col("x")).over(full))
      .withColumn("cum", sum(col("x")).over(run))
      .withColumn("i", row_number().over(w))
      .withColumn("cusum",
        dec(col("n_days")) * dec(col("cum")) - dec(col("i")) * dec(col("s")))
    val pick = Window.partitionBy("event_type")
      .orderBy(abs(col("cusum")).desc, col("day").asc)
    scored
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("cp_day"),
        col("cusum").cast("double").as("cusum"), col("n_days"))
  }

  /** Declared query: CUSUM changepoint day per event_type. */
  val qTsChangepoint: Q = (s, d) => cusumChangepoint(Tables.events(s, d))

  /** Time-weighted average per entity — the step-function integral that
    * billing/sensor/TWAP rollups need (a plain AVG over-weights bursts):
    * each reading holds until the next one, so
    * TWA = Σ value_i·(t_{i+1}−t_i) / (t_n − t_0). Exactness: values on
    * centi-unit longs, gaps in exact µs, products accumulated as
    * decimal(38,0) (centi·µs can brush Long range on year-long spans at
    * petabyte volumes), and ONE final double division mirrored
    * op-for-op in the oracle. One user-keyed window pass feeds a
    * same-keyed aggregate — a single exchange. */
  def timeWeightedAvg(events: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy("ts", "event_id")
    def dec(c: Column) = c.cast("decimal(19,0)")
    events
      .select(col(keyCol), col("ts"), col("event_id"),
        col(valueCol).cast("decimal(18,2)").multiply(lit(100))
          .cast("long").as("q"),
        unix_micros(col("ts")).as("us"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(dec(col("q")) * dec(col("next_us") - col("us"))).as("num"),
        sum(col("next_us") - col("us")).as("den_us"),
        count(lit(1)).as("n_holds"))
      .select(col(keyCol), col("n_holds"),
        (col("num").cast("double") /
          (col("den_us").cast("double") * lit(100.0))).as("twa"))
  }

  /** Declared query: time-weighted average event value per user. */
  val qTsTimeWeighted: Q = (s, d) =>
    timeWeightedAvg(Tables.events(s, d), "user_id", "value")

  /** Seasonal-naive forecast backtest — the evaluation harness every
    * production forecaster is judged against before anything fancier
    * ships: predict each day's per-type total as the SAME WEEKDAY's
    * total one week earlier, then score the whole history per type
    * with exact integer error metrics — n_days evaluated, the summed
    * absolute error in cents, MAE in milli-cents
    * (`sae·1000 div n_days`) and WAPE in ppm (`sae·10⁶ div Σ|actual|`
    * — the aggregate-normalized form that stays exact where per-day
    * MAPE would divide by near-zero days).
    *
    * Scale shape: ONE corpus exchange contracts the trace to the
    * (type, day) daily table; the forecast join is the contraction
    * against itself on (type, day−7) and the final per-type fold rides
    * the same keys. Days with no week-earlier actual are skipped —
    * backtests score where a prediction exists. Headroom: cents sums
    * in decimal(38) past 10¹⁸ cents/day. */
  val qTsBacktest: Q = (s, d) => {
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("actual"))
    val fc = daily.select(col("event_type"),
      date_add(col("day"), 7).as("day"), col("actual").as("forecast"))
    daily.join(fc, Seq("event_type", "day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(dec(col("actual")) - col("forecast"))).as("sae"),
        sum(abs(dec(col("actual")))).as("sum_actual"))
      .select(col("event_type"), col("n_days"),
        col("sae").cast("long").as("sae_cents"),
        expr("CAST(sae * 1000 div n_days AS LONG)").as("mae_milli_cents"),
        expr("""CASE WHEN sum_actual > 0 THEN
                CAST(sae * 1000000 div sum_actual AS LONG) END""")
          .as("wape_ppm"))
  }

  /** Lags (days) swept by the cross-correlation scan. */
  val CrossCorrLags: Seq[Int] = 0 to 7

  /** Lead–lag discovery: Pearson cross-correlation of every event
    * type's daily cents series against the `purchase` anchor series at
    * lags 0..7 days — "which signals lead purchases, and by how much?"
    * Sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    * decimal(38) integers; the single float readout
    * r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))
    * is the IDENTICAL expression over the same exact integers in both
    * engines — sqrt, ×, / are all correctly-rounded IEEE ops, so
    * cross-engine parity holds where exp/ln would not (the
    * [[graft.operators.Graph]] assortativity device plus one sqrt).
    * Degenerate windows (either series constant) read NULL.
    *
    * Scale shape: ONE corpus exchange builds the (type, day) daily
    * contraction; the 8-lag fan-out is map-side ON the contraction
    * (the bootstrap device), the anchor join re-keys contraction-sized
    * data by day, and the (type, lag) fold ends it. Headroom: n·Σx²
    * rides decimal(38) to ~10¹² cents/day × 10⁴ days. */
  val qTsCrossCorr: Q = (s, d) => {
    def dec(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val daily = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
    val anchor = daily.filter(col("event_type") === "purchase")
      .select(col("day"), col("v").as("y"))
    daily
      .withColumn("lag", explode(array(CrossCorrLags.map(lit): _*)))
      .select(col("event_type"), col("lag"),
        date_add(col("day"), col("lag")).as("day"), col("v").as("x"))
      .join(anchor, "day")
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * col("y")).as("sxy"),
        sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("y")) * col("y")).as("syy"))
      .select(col("event_type"), col("lag"), col("n"),
        expr("""CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy THEN
                CAST(CAST(n * sxy - sx * sy AS STRING) AS DOUBLE)
                / sqrt(CAST(CAST(n * sxx - sx * sx AS STRING) AS DOUBLE)
                     * CAST(CAST(n * syy - sy * sy AS STRING) AS DOUBLE))
                END""").as("r"))
  }

  /** Offset that keeps every Theil–Sen slope numerator non-negative
    * before the integer division (|Δcents|·1000 can never reach K·Δday
    * for Δday ≥ 1 at any plausible daily volume — K = 10¹⁸ milli-cents
    * per day), so Spark's truncating `div` and DuckDB's flooring `//`
    * agree on NEGATIVE slopes too: slope = (Δv·1000 + K·Δd) div Δd − K,
    * with the left operand non-negative by construction. */
  val TheilSenOffset = BigDecimal("1000000000000000000")

  /** Theil–Sen robust trend per event type at a DECLARED milli-cents/
    * day grain: the median of all pairwise daily slopes — the trend
    * estimator that shrugs off the outlier days OLS chases
    * ([[graft.operators.AssociationOps]] qRegrFit is the L2 twin).
    * Slopes quantize to exact integers via the offset device above;
    * the median is an exact ORDER STATISTIC (row_number over the
    * per-type slope ranking), emitted as the two middle order stats
    * `med_lo`/`med_hi` rather than their average — averaging two
    * possibly-negative milli values reintroduces the trunc-vs-floor
    * divergence the offset just removed.
    *
    * Scale shape: the (type, day) contraction self-joins on the type
    * key (day < day residual) — pair volume is |days|² per type, and
    * |days| is bounded by the CALENDAR, not the corpus, so the pair
    * table stays ~10⁵ rows per type-year at any data scale; the rank
    * window and fold ride the pair table's own type partitioning. */
  val qTsTheilSen: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    def dec(c: org.apache.spark.sql.Column) =
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
    val slopes = daily.as("a")
      .join(daily.as("b"), col("a.event_type") === col("b.event_type")
        && col("a.day") < col("b.day"))
      .select(col("a.event_type").as("event_type"),
        dec(col("b.v") - col("a.v")).as("dv"),
        (col("b.day") - col("a.day")).cast("long").as("dd"))
      .select(col("event_type"),
        expr("""CAST((dv * 1000
                + CAST('1000000000000000000' AS DECIMAL(38,0)) * dd)
                div dd
                - CAST('1000000000000000000' AS DECIMAL(38,0)) AS LONG)""")
          .as("slope_milli"))
    val w = Window.partitionBy("event_type").orderBy("slope_milli")
    val wAll = Window.partitionBy("event_type")
    slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .groupBy(col("event_type"))
      .agg(max(col("cnt")).as("n_pairs"),
        max(when(col("rn") === expr("(cnt + 1) div 2"),
          col("slope_milli"))).as("med_lo"),
        max(when(col("rn") === expr("(cnt + 2) div 2"),
          col("slope_milli"))).as("med_hi"))
  }

  val queries: Map[String, Q] = Map(
    "q_ts_theil_sen" -> qTsTheilSen,
    "q_ts_cross_corr" -> qTsCrossCorr,
    "q_ts_backtest" -> qTsBacktest,
    "q_ts_changepoint" -> qTsChangepoint,
    "q_ts_time_weighted" -> qTsTimeWeighted,
    "q_fill_forward" -> qFillForward,
    "q_rolling_active" -> qRollingActive,
    "q_concurrency_sweep" -> qConcurrencySweep,
    "q_autocorr" -> qAutocorr,
    "q_resample_ohlc" -> qResampleOhlc)

  val oracleSql: Map[String, String] = Map(
    "q_ts_theil_sen" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(ts AS DATE) - DATE '2024-01-01' AS day,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT a.event_type,
             CAST(b.v - a.v AS HUGEINT) AS dv,
             CAST(b.day - a.day AS BIGINT) AS dd
           FROM daily a JOIN daily b
             ON b.event_type = a.event_type AND a.day < b.day),
         s AS (
           SELECT event_type,
             CAST((dv * 1000
                 + CAST('1000000000000000000' AS HUGEINT) * dd) // dd
               - CAST('1000000000000000000' AS HUGEINT) AS BIGINT)
               AS slope_milli
           FROM p),
         r AS (
           SELECT event_type, slope_milli,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY slope_milli) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
           FROM s)
         SELECT event_type, CAST(MAX(cnt) AS BIGINT) AS n_pairs,
           MAX(CASE WHEN rn = (cnt + 1) // 2 THEN slope_milli END)
             AS med_lo,
           MAX(CASE WHEN rn = (cnt + 2) // 2 THEN slope_milli END)
             AS med_hi
         FROM r GROUP BY event_type ORDER BY event_type""",
    "q_ts_cross_corr" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
           FROM events GROUP BY 1, 2),
         a AS (SELECT day, v AS y FROM daily
               WHERE event_type = 'purchase'),
         x AS (
           SELECT d.event_type, l.lag,
             d.day + CAST(l.lag AS INT) AS day, d.v AS x
           FROM daily d,
             (SELECT unnest(generate_series(0, 7)) AS lag) l),
         g AS (
           SELECT x.event_type, x.lag, COUNT(*) AS n,
             SUM(CAST(x.x AS HUGEINT)) AS sx,
             SUM(CAST(a.y AS HUGEINT)) AS sy,
             SUM(CAST(x.x AS HUGEINT) * a.y) AS sxy,
             SUM(CAST(x.x AS HUGEINT) * x.x) AS sxx,
             SUM(CAST(a.y AS HUGEINT) * a.y) AS syy
           FROM x JOIN a USING (day) GROUP BY 1, 2)
         SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n,
           CASE WHEN n * sxx > sx * sx AND n * syy > sy * sy THEN
             CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
                  * CAST(CAST(n * syy - sy * sy AS VARCHAR) AS DOUBLE))
           END AS r
         FROM g ORDER BY event_type, lag""",
    "q_ts_backtest" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS actual
           FROM events GROUP BY 1, 2),
         j AS (
           SELECT a.event_type, a.actual, f.actual AS forecast
           FROM daily a JOIN daily f
             ON f.event_type = a.event_type AND f.day = a.day - 7),
         g AS (
           SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(abs(CAST(actual AS HUGEINT) - forecast)) AS sae,
             SUM(abs(CAST(actual AS HUGEINT))) AS sum_actual
           FROM j GROUP BY event_type)
         SELECT event_type, n_days,
           CAST(sae AS BIGINT) AS sae_cents,
           CAST(sae * 1000 // n_days AS BIGINT) AS mae_milli_cents,
           CASE WHEN sum_actual > 0 THEN
             CAST(sae * 1000000 // sum_actual AS BIGINT) END AS wape_ppm
         FROM g ORDER BY event_type""",
    "q_ts_time_weighted" ->
      """WITH g AS (
           SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
             epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_us
           FROM events),
         a AS (
           SELECT user_id,
             SUM(CAST(q AS HUGEINT) * CAST(next_us - us AS HUGEINT)) AS num,
             CAST(SUM(next_us - us) AS BIGINT) AS den_us,
             CAST(COUNT(*) AS BIGINT) AS n_holds
           FROM g WHERE next_us IS NOT NULL
           GROUP BY user_id)
         SELECT user_id, n_holds,
           CAST(num AS DOUBLE) / (CAST(den_us AS DOUBLE) * 100.0) AS twa
         FROM a ORDER BY user_id""",
    "q_ts_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         sc AS (
           SELECT event_type, day,
             COUNT(*) OVER (PARTITION BY event_type) AS n_days,
             SUM(x) OVER (PARTITION BY event_type) AS s,
             SUM(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
           FROM daily),
         cs AS (
           SELECT event_type, day, n_days,
             CAST(n_days AS HUGEINT) * CAST(cum AS HUGEINT)
               - CAST(i AS HUGEINT) * CAST(s AS HUGEINT) AS cusum
           FROM sc)
         SELECT event_type, day AS cp_day, CAST(cusum AS DOUBLE) AS cusum,
           n_days
         FROM cs
         QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
           ORDER BY abs(cusum) DESC, day ASC) = 1""",
    "q_autocorr" ->
      """WITH d AS (
           SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
                      CAST(SUM(x) AS BIGINT) AS s FROM d),
         c AS (SELECT day, n_days, n_days * x - s AS c FROM d, t),
         l AS (SELECT n_days, c,
                 lag(c, 1) OVER (ORDER BY day) AS c1,
                 lag(c, 7) OVER (ORDER BY day) AS c7
               FROM c),
         a AS (SELECT MAX(n_days) AS n_days,
                 SUM(CAST(c AS HUGEINT) * c) AS den,
                 SUM(CAST(c AS HUGEINT) * c1) AS num1,
                 SUM(CAST(c AS HUGEINT) * c7) AS num7
               FROM l)
         SELECT 1 AS lag, n_days,
           CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS autocorr FROM a
         UNION ALL
         SELECT 7 AS lag, n_days,
           CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE) AS autocorr FROM a
         ORDER BY lag""",
    "q_fill_forward" ->
      """WITH e AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN event_id % 3 = 0 THEN value END AS reading
           FROM events)
         SELECT event_id, user_id, reading,
                last_value(reading IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS reading_filled
         FROM e ORDER BY event_id""",
    "q_rolling_active" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
         w AS (SELECT unnest(generate_series(day,
                 day + INTERVAL 6 DAY, INTERVAL 1 DAY)) AS wts, user_id
               FROM e)
         SELECT CAST(wts AS DATE) AS wday,
                COUNT(DISTINCT user_id) AS active_users,
                COUNT(*) AS n_events
         FROM w GROUP BY 1 ORDER BY wday""",
    "q_concurrency_sweep" ->
      """WITH pts AS (
           SELECT CAST(ts AS DATE) AS day, ts AS pt, 1 AS delta, event_id
           FROM events
           UNION ALL
           SELECT CAST(ts AS DATE) AS day,
             least(ts + INTERVAL 300 SECOND,
               CAST(CAST(ts AS DATE) + 1 AS TIMESTAMP)) AS pt,
             -1 AS delta, event_id
           FROM events),
         run AS (
           SELECT day, delta,
             SUM(delta) OVER (PARTITION BY day
               ORDER BY pt, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
           FROM pts)
         SELECT day,
           CAST(MAX(conc) AS BIGINT) AS max_concurrent,
           CAST(COUNT(*) FILTER (WHERE delta = 1) AS BIGINT) AS n_events
         FROM run GROUP BY day ORDER BY day""",
    "q_resample_ohlc" ->
      """WITH h AS (
           SELECT event_type, date_trunc('hour', ts) AS hr, ts, event_id,
                  value
           FROM events),
         r AS (
           SELECT event_type, hr, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, hr
               ORDER BY ts ASC, event_id ASC) AS ra,
             ROW_NUMBER() OVER (PARTITION BY event_type, hr
               ORDER BY ts DESC, event_id DESC) AS rd
           FROM h)
         SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M') AS hr,
                MAX(CASE WHEN ra = 1 THEN value END) AS open,
                MAX(value) AS high,
                MIN(value) AS low,
                MAX(CASE WHEN rd = 1 THEN value END) AS close,
                COUNT(*) AS n
         FROM r GROUP BY event_type, hr
         ORDER BY event_type, hr""")
}
