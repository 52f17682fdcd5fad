package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import graft.Tables

/** Conversion analytics over the event trace: touch attribution,
  * top paths, time-to-convert, and deterministic experiment splits —
  * the marketing-analytics consumers of the hourly event series the
  * reference lands (`dags/warsaw-delays.py:182,186` is the ingest side
  * of this data shape).
  *
  * Scale shape: every operator here is one user-keyed window/aggregate
  * chain — the per-user sequence logic (last preceding touch, first N
  * steps, first conversion at-or-after signup) rides ordered windows
  * with O(1) state per row, never a self-join on (user, rank), and the
  * second aggregation reuses the user_id hash partitioning wherever the
  * grouping key extends it. Outputs are touch ids, path strings, and
  * integer day/µs arithmetic — exact in both engines (§7.4).
  */
object Attribution {

  type Q = (SparkSession, String) => DataFrame

  /** Last-touch attribution: each purchase is credited to the user's
    * most recent click at-or-before it (ties within a timestamp break
    * by event_id, the trace's total order). `last(..., ignoreNulls)`
    * over a running user-keyed window carries the latest click id
    * forward — one window pass over only the click/purchase rows, no
    * purchase×click join; `click_id` is NULL for organic purchases. */
  def attributionLast(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("click_id",
        last(when(col("event_type") === "click", col("event_id")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"))
  }

  val qAttributionLast: Q = (s, d) => attributionLast(Tables.events(s, d))

  /** Linear multi-touch attribution: every purchase splits its credit
    * EQUALLY across all of the user's preceding touchpoints (clicks
    * and views strictly before it in the (ts, event_id) trace order),
    * with the per-touch share declared as the integer
    * `10⁶ div n_touches` ppm — deterministic and engine-exact where a
    * float 1/n would drift. Output is the production artifact: one row
    * per purchase carrying its per-channel touch counts and the ppm
    * credit each channel earns (`NULL` for organic purchases with no
    * preceding touch, matching DuckDB's `// 0`).
    *
    * Shape: NO purchase×touch join — the per-channel preceding-touch
    * counts are two running window sums over the user's trace, so the
    * whole query is one user-keyed window pass (the
    * [[attributionLast]] discipline extended to counts), linear at any
    * trace length. */
  def attributionLinear(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("n_click", coalesce(sum(
        when(col("event_type") === "click", 1L)).over(w), lit(0L)))
      .withColumn("n_view", coalesce(sum(
        when(col("event_type") === "view", 1L)).over(w), lit(0L)))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("n_click"), col("n_view"),
        expr("""CASE WHEN n_click + n_view > 0 THEN
                CAST(n_click * (1000000 div (n_click + n_view)) AS LONG)
                END""").as("click_credit_ppm"),
        expr("""CASE WHEN n_click + n_view > 0 THEN
                CAST(n_view * (1000000 div (n_click + n_view)) AS LONG)
                END""").as("view_credit_ppm"))
  }

  val qAttributionLinear: Q = (s, d) =>
    attributionLinear(Tables.events(s, d))

  /** Top-20 opening paths: each user's first five event types joined
    * with '>' (shorter traces yield shorter paths — concat_ws skips the
    * NULL steps identically in both engines), counted across users.
    * The rank→pivot uses max-of-CASE per step, so the user collapse
    * reuses the window's user_id partitioning; only |paths| rows reach
    * the final count, and the top-k is a TakeOrdered (rank ties break
    * by path), never a global sort. */
  def pathTopk(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val step = (n: Int) => max(when(col("rn") === n, col("event_type")))
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(concat_ws(">", step(1), step(2), step(3), step(4), step(5))
        .as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  val qPathTopk: Q = (s, d) => pathTopk(Tables.events(s, d))

  /** Time-to-convert histogram: for each signed-up user, whole days
    * from first signup to first purchase at-or-after it; the NULL
    * bucket counts signed-up users who never converted. Day arithmetic
    * is integer datediff over calendar dates — exact in both engines.
    * The signup time rides a user-keyed window min so conversion can be
    * conditioned on it in the same pass; the user collapse reuses that
    * partitioning, and only |users| rows reach the day-bucket count. */
  def timeToConvert(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .groupBy("user_id")
      .agg(max(col("t_signup")).as("t_signup"),
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("t_signup"), col("ts"))).as("t_conv"))
      .filter(col("t_signup").isNotNull)
      .select(datediff(to_date(col("t_conv")), to_date(col("t_signup")))
        .cast("long").as("days_to_convert"))
      .groupBy("days_to_convert")
      .agg(count(lit(1)).as("n_users"))
  }

  val qTimeToConvert: Q = (s, d) => timeToConvert(Tables.events(s, d))

  /** Deterministic A/B readout: users split into two arms by the same
    * 16-bit md5 id-hash the train/test splitter uses ([[CorpusPipeline]]
    * — rerun-stable, partitioning-independent, no RNG), then per arm:
    * exposed users, converters (≥1 purchase), events, and purchases.
    * The per-user collapse is one user-keyed aggregate; the arm fold
    * then touches |users| rows. At 100 TB the arm assignment is a
    * map-side expression on the grouping key — no assignment table to
    * join, no skew (md5 spreads users uniformly). */
  def abtestConversion(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
      .withColumn("arm",
        when(Hashing.md5Bucket(col("user_id"), "", 2L) === 0L, "A")
          .otherwise("B"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        count(when(col("n_purchases") > 0, 1)).as("n_converters"),
        sum(col("n_events")).as("n_events"),
        sum(col("n_purchases")).as("n_purchases"))

  val qAbtestConversion: Q = (s, d) => abtestConversion(Tables.events(s, d))

  /** Welch two-sample significance readout per event type: the arms
    * are the same md5 split as [[abtestConversion]]; values ride
    * integer cents; the |t| > 2 decision is the NORMALIZED quantized
    * inequality
    *   d_m²·(n_a−1)(n_b−1) > 4·[v_ua·(n_b−1) + v_ub·(n_a−1)],
    *   d_m  = (10³·|S_a·n_b − S_b·n_a|) div (n_a·n_b)   (milli-cents),
    *   v_u* = (10⁶·(n·Q − S²)) div n²                    (micro grain)
    * — no sqrt or float anywhere, and both engines integer-divide the
    * same non-negative operands. The decision is the Welch test at
    * DECLARED grain (the qDriftChisq micro-grain precedent): a true
    * mean difference under one milli-cent reads insignificant by
    * construction.
    *
    * History: through round 12 this was the raw cross-multiplied form
    * A²(n_a−1)(n_b−1) > 4[(n_aQ_a−S_a²)n_b²(n_b−1) + …] — degree 6 in
    * the arm counts, which breached decimal(38) AND DuckDB's HUGEINT
    * at the 100× fixture (2×10⁶ rows/arm → 2.07·10³⁸; caught by the
    * round-13 full sf10 gate, the old "headroom to ~10⁹ rows" docstring
    * had misjudged the n⁶ growth). The normalized form caps every
    * intermediate at ~10³⁶ through 10¹⁰ rows per arm with cents ≤ 10⁵.
    *
    * Plan shape: ONE map-side-combinable rollup of the raw stream into
    * 5×(6 sufficient statistics) — the significance decision itself
    * costs nothing at any scale. */
  def abtestTtest(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cents = (col("value").cast(DecimalType(18, 2)) * lit(100))
      .cast("long")
    val isA = Hashing.md5Bucket(col("user_id"), "", 2L) === 0L
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val g = events
      .select(col("event_type"), isA.as("arm_a"), cents.as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("arm_a"), 1)).as("n_a"),
        count(when(!col("arm_a"), 1)).as("n_b"),
        // no .otherwise(0): an EMPTY arm must sum to NULL exactly like
        // the oracle's SUM(...) FILTER, so the significance expression
        // null-propagates identically in both engines
        sum(when(col("arm_a"), col("cents"))).as("sum_a"),
        sum(when(!col("arm_a"), col("cents"))).as("sum_b"),
        sum(when(col("arm_a"), dec(col("cents")) * dec(col("cents"))))
          .as("q_a"),
        sum(when(!col("arm_a"), dec(col("cents")) * dec(col("cents"))))
          .as("q_b"))
    // Decision in the NORMALIZED form (round-13 sf10 catch): the raw
    // cross-multiplied inequality a²·A·B > 4(V_a n_b² B + V_b n_a² A)
    // is degree-6 in the arm counts — at 2×10⁶ rows/arm (the 100×
    // fixture) a²·A·B alone breaches decimal(38) AND DuckDB's HUGEINT,
    // so BOTH engines die exactly where the test matters most. Divide
    // through by (n_a n_b)² and quantize the two rationals at fixed
    // grains (the qDriftChisq micro-grain precedent): d_m = |mean
    // difference| in MILLI-cents (10³·|a| div n_a n_b), v_u = per-arm
    // variance proxy in micro grain (10⁶·V div n²). The decision
    //   d_m²·A·B > 4(v_ua·B + v_ub·A)
    // is the same Welch test at declared grain — effect sizes under a
    // milli-cent read insignificant by construction — and every
    // intermediate stays ≤ ~10³⁶ through 10¹⁰ rows per arm (10³·|a| ≤
    // 10³·C·n² and 10⁶·V ≤ 10⁶·n²C² with cents C ≤ 10⁵). All operands
    // non-negative (abs; V ≥ 0 by Cauchy-Schwarz), so Spark's div and
    // DuckDB's // agree. Found by the round-13 full sf10 gate:
    // NUMERIC_VALUE_OUT_OF_RANGE at 2.07e38.
    g.select(col("event_type"), col("n_a"), col("n_b"),
        col("sum_a"), col("sum_b"),
        // CASE guards: ANSI `div` raises on a zero divisor even with a
        // NULL numerator, so an empty arm must short-circuit to NULL
        // (the FeatureOps degenerate-denominator pattern)
        expr("""CASE WHEN n_a > 0 AND n_b > 0 THEN
                (1000 * abs(CAST(sum_a AS DECIMAL(38,0)) * n_b
                  - CAST(sum_b AS DECIMAL(38,0)) * n_a))
                div (CAST(n_a AS DECIMAL(38,0)) * n_b) END""").as("dm"),
        expr("""CASE WHEN n_a > 0 THEN
                (1000000 * (CAST(n_a AS DECIMAL(38,0)) * q_a
                  - CAST(sum_a AS DECIMAL(38,0)) * sum_a))
                div (CAST(n_a AS DECIMAL(38,0)) * n_a) END""").as("vua"),
        expr("""CASE WHEN n_b > 0 THEN
                (1000000 * (CAST(n_b AS DECIMAL(38,0)) * q_b
                  - CAST(sum_b AS DECIMAL(38,0)) * sum_b))
                div (CAST(n_b AS DECIMAL(38,0)) * n_b) END""").as("vub"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        col("sum_a"), col("sum_b"),
        // dm/vua/vub land as LONG out of Spark's integral `div` while
        // the DuckDB oracle keeps them HUGEINT — rehydrate to
        // DECIMAL(38,0) BEFORE the squaring/products so exceeding the
        // documented envelope (cents ≤ 10⁵, ≤ 10¹⁰ rows/arm) surfaces
        // as a loud NULL/overflow on both engines instead of a silent
        // int64 wrap on the Spark side only (ADVICE r13).
        when(col("n_a") > 0 && col("n_b") > 0,
          expr("""CAST(dm AS DECIMAL(38,0)) * dm
                    * (CAST(n_a AS DECIMAL(38,0)) - 1) * (n_b - 1)
                  > 4 * (CAST(vua AS DECIMAL(38,0))
                           * (CAST(n_b AS DECIMAL(38,0)) - 1)
                       + CAST(vub AS DECIMAL(38,0))
                           * (CAST(n_a AS DECIMAL(38,0)) - 1))"""))
          .as("significant"))
  }

  val qAbtestTtest: Q = (s, d) => abtestTtest(Tables.events(s, d))

  val queries: Map[String, Q] = Map(
    "q_attribution_last" -> qAttributionLast,
    "q_attribution_linear" -> qAttributionLinear,
    "q_path_topk" -> qPathTopk,
    "q_time_to_convert" -> qTimeToConvert,
    "q_abtest_conversion" -> qAbtestConversion,
    "q_abtest_ttest" -> qAbtestTtest)

  val oracleSql: Map[String, String] = Map(
    "q_abtest_ttest" ->
      """WITH e AS (
           SELECT event_type,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
               AS INT) % 2 = 0 AS arm_a,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events),
         g AS (
           SELECT event_type,
             COUNT(*) FILTER (WHERE arm_a) AS n_a,
             COUNT(*) FILTER (WHERE NOT arm_a) AS n_b,
             CAST(SUM(cents) FILTER (WHERE arm_a) AS BIGINT) AS sum_a,
             CAST(SUM(cents) FILTER (WHERE NOT arm_a) AS BIGINT) AS sum_b,
             SUM(CAST(cents AS HUGEINT) * cents) FILTER (WHERE arm_a)
               AS q_a,
             SUM(CAST(cents AS HUGEINT) * cents) FILTER (WHERE NOT arm_a)
               AS q_b
           FROM e GROUP BY event_type),
         q AS (
           SELECT event_type, n_a, n_b, sum_a, sum_b,
             CASE WHEN n_a > 0 AND n_b > 0 THEN
               (1000 * abs(CAST(sum_a AS HUGEINT) * n_b
                 - CAST(sum_b AS HUGEINT) * n_a))
               // (CAST(n_a AS HUGEINT) * n_b) END AS dm,
             CASE WHEN n_a > 0 THEN
               (1000000 * (CAST(n_a AS HUGEINT) * q_a
                 - CAST(sum_a AS HUGEINT) * sum_a))
               // (CAST(n_a AS HUGEINT) * n_a) END AS vua,
             CASE WHEN n_b > 0 THEN
               (1000000 * (CAST(n_b AS HUGEINT) * q_b
                 - CAST(sum_b AS HUGEINT) * sum_b))
               // (CAST(n_b AS HUGEINT) * n_b) END AS vub
           FROM g)
         SELECT event_type, n_a, n_b, sum_a, sum_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
             dm * dm * (n_a - 1) * (CAST(n_b AS HUGEINT) - 1)
             > 4 * (vua * (CAST(n_b AS HUGEINT) - 1)
                  + vub * (CAST(n_a AS HUGEINT) - 1)) END AS significant
         FROM q""",
    "q_attribution_linear" ->
      """WITH s AS (
           SELECT user_id, event_type, event_id,
             COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_click,
             COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_view
           FROM events WHERE event_type IN ('click', 'view', 'purchase'))
         SELECT event_id AS purchase_id, user_id,
           CAST(n_click AS BIGINT) AS n_click,
           CAST(n_view AS BIGINT) AS n_view,
           CASE WHEN n_click + n_view > 0 THEN
             CAST(n_click * (1000000 // (n_click + n_view)) AS BIGINT)
           END AS click_credit_ppm,
           CASE WHEN n_click + n_view > 0 THEN
             CAST(n_view * (1000000 // (n_click + n_view)) AS BIGINT)
           END AS view_credit_ppm
         FROM s WHERE event_type = 'purchase' ORDER BY purchase_id""",
    "q_attribution_last" ->
      """WITH s AS (
           SELECT user_id, event_type, event_id,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
               IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS click_id
           FROM events WHERE event_type IN ('click', 'purchase'))
         SELECT event_id AS purchase_id, user_id, click_id
         FROM s WHERE event_type = 'purchase' ORDER BY purchase_id""",
    "q_path_topk" ->
      """WITH r AS (
           SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
           FROM events),
         p AS (
           SELECT user_id, concat_ws('>',
             max(CASE WHEN rn = 1 THEN event_type END),
             max(CASE WHEN rn = 2 THEN event_type END),
             max(CASE WHEN rn = 3 THEN event_type END),
             max(CASE WHEN rn = 4 THEN event_type END),
             max(CASE WHEN rn = 5 THEN event_type END)) AS path
           FROM r WHERE rn <= 5 GROUP BY user_id)
         SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
         FROM p GROUP BY path
         ORDER BY n_users DESC, path LIMIT 20""",
    "q_time_to_convert" ->
      """WITH s AS (
           SELECT user_id, event_type, ts,
             min(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id) AS t_signup
           FROM events),
         u AS (
           SELECT user_id, max(t_signup) AS t_signup,
             min(CASE WHEN event_type = 'purchase' AND ts >= t_signup
                 THEN ts END) AS t_conv
           FROM s GROUP BY user_id)
         SELECT CAST(date_diff('day', CAST(t_signup AS DATE),
             CAST(t_conv AS DATE)) AS BIGINT) AS days_to_convert,
           CAST(COUNT(*) AS BIGINT) AS n_users
         FROM u WHERE t_signup IS NOT NULL
         GROUP BY days_to_convert ORDER BY days_to_convert""",
    "q_abtest_conversion" ->
      """WITH u AS (
           SELECT user_id, COUNT(*) AS n_events,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases
           FROM events GROUP BY user_id),
         a AS (
           SELECT CASE WHEN CAST('0x' || substring(
               md5(CAST(user_id AS VARCHAR)), 1, 4) AS INT) % 2 = 0
             THEN 'A' ELSE 'B' END AS arm, n_events, n_purchases
           FROM u)
         SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) FILTER (WHERE n_purchases > 0) AS BIGINT)
             AS n_converters,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_purchases) AS BIGINT) AS n_purchases
         FROM a GROUP BY arm ORDER BY arm""")
}
