package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Behavioral analytics over the event stream: ordered funnels and
  * cohort retention — the consumer queries of an hourly-scraped event
  * series (`dags/warsaw-delays.py:182,186` is the landing side of
  * exactly this data shape).
  *
  * Scale shape: both operators are windows/aggregations over ONE
  * user-keyed shuffle — consecutive windows and the groupBy share the
  * `user_id` partitioning, so adding funnel steps costs map-side work,
  * not exchanges. No self-joins: the "step B after step A" ordering
  * constraint rides per-user window minima, and the retention flag is a
  * per-row CASE folded by max().
  */
object Behavior {

  type Q = (SparkSession, String) => DataFrame

  /** Ordered signup → click → purchase funnel: users counted at step N
    * only if their earliest step-N event is at or after their earliest
    * qualifying step-(N−1) event. One row: the three step counts. */
  def funnelSteps(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_signup",
        min(when(col("event_type") === "signup", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("ts") >= col("t_signup"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("ts") >= col("t_click"), col("ts"))).over(w))
      // Collapse to one row per user BEFORE counting: this groupBy reuses
      // the window's user_id hash partitioning (no exchange), and the
      // global count then aggregates |users| flag rows — vs countDistinct
      // over raw events, whose Expand would triple the event table and
      // re-shuffle it for the distinct.
      .groupBy("user_id")
      .agg(
        max(col("t_signup").isNotNull).as("f_signup"),
        max(col("t_click").isNotNull).as("f_click"),
        max(col("t_purchase").isNotNull).as("f_purchase"))
      .groupBy()
      .agg(
        count(when(col("f_signup"), 1)).as("n_signup"),
        count(when(col("f_click"), 1)).as("n_click"),
        count(when(col("f_purchase"), 1)).as("n_purchase"))
  }

  val qFunnelSteps: Q = (s, d) => funnelSteps(Tables.events(s, d))

  /** Cohort retention: users grouped by first-seen day; retained =
    * active again within the 7 days after that day. */
  def retentionCohort(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .withColumn("cohort", min(col("day")).over(w))
      .groupBy("user_id", "cohort")
      .agg(max(when(col("day").between(
        date_add(col("cohort"), 1), date_add(col("cohort"), 7)), 1)
        .otherwise(0)).as("retained"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_users"),
        count(when(col("retained") === 1, 1)).as("n_retained"))
  }

  val qRetentionCohort: Q = (s, d) => retentionCohort(Tables.events(s, d))

  /** Cohort lifetime-value curve — the revenue companion to
    * [[retentionCohort]]: users cohort by their first-seen day, every
    * purchase lands in a whole-week age bucket
    * (`datediff div 7` — integer, engine-exact), and each
    * (cohort, age_week) cell reads purchases, exact cents, the
    * cohort's running cumulative cents, and cumulative LTV per cohort
    * user in milli-cents (`cum·1000 div n_users`). Ages without
    * purchases simply have no row — the cumulative is exact at every
    * emitted cell.
    *
    * Shape: the cohort stamp is the same user-keyed window min as
    * retention; the (cohort, age) fold contracts the trace, the
    * cumulative window and the |cohorts|-row size join ride the
    * contraction. Headroom: cents sums ride decimal(38,0) (HUGEINT in
    * the oracle) — exact past 10¹⁸ cents per cell. */
  def cohortLtv(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val base = events
      .select(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
      .withColumn("cohort", min(col("day")).over(w))
    val sizes = base.groupBy(col("cohort"))
      .agg(count_distinct(col("user_id")).as("n_users"))
    val cells = base
      .filter(col("event_type") === "purchase")
      .groupBy(col("cohort"),
        expr("datediff(day, cohort) div 7").as("age_week"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents").cast("decimal(38,0)")).as("value_cents"))
    val wCum = Window.partitionBy("cohort").orderBy("age_week")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_cents", sum(col("value_cents")).over(wCum))
      .join(sizes, "cohort")
      .select(col("cohort"), col("age_week"), col("n_users"),
        col("n_purchases"),
        col("value_cents").cast("long").as("value_cents"),
        col("cum_cents").cast("long").as("cum_cents"),
        expr("CAST(cum_cents * 1000 div n_users AS LONG)")
          .as("ltv_milli_cents"))
  }

  val qCohortLtv: Q = (s, d) => cohortLtv(Tables.events(s, d))

  /** Gaps-and-islands: maximal runs of consecutive same-type events per
    * user — the classic relational pattern behind dwell/stop detection on
    * a trace ("how long did the vehicle keep reporting `error`"), distinct
    * from time-gap sessionization (`q_window_session` keys on silence,
    * this keys on value changes).
    *
    * The island id is the row_number difference trick — both windows and
    * the final aggregation hash-partition on user_id-rooted keys, so this
    * is window-state O(1) per row with no self-join, and the island id is
    * a pure function of the trace (partitioning-independent). */
  def runsConsecutive(events: DataFrame): DataFrame = {
    // r18: island id via lag + cumulative change count instead of the
    // two-row_number difference trick — the rn-diff windows sort the
    // SAME exchange twice with different orders ((user, ts, id) and
    // (user, type, ts, id)); lag and the running change-sum share one
    // (user, ts, id) sort (the second Window rides the first's output
    // order, no re-sort). Maximal same-type runs get one island index
    // each either way, so the grouped output is row-identical (grp is
    // dropped). Plan: 2 Sorts → 1; back-to-back A/B at local[32]:
    // within noise at sf0.1 (median ≈0.75 both forms), ~12% at the 10×
    // mirror (median 1.17 vs 1.33 s) where the second sort's cost
    // shows; kept for the structurally smaller plan. Oracle verified
    // at sf0.01, sf0.1 and the mirror.
    val wAll = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wCum = wAll.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("chg",
        when(col("event_type") =!= lag(col("event_type"), 1).over(wAll), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("chg")).over(wCum))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      .agg(count(lit(1)).as("run_len"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
      .drop("grp")
  }

  val qRunsConsecutive: Q = (s, d) => runsConsecutive(Tables.events(s, d))

  /** First-order Markov transition counts over per-user event sequences:
    * for every (from_type → to_type) adjacent pair in a user's
    * ts-ordered trace, the total transition count and the number of
    * distinct users making it — the raw material of a behavioral
    * transition matrix (and of n-gram sequence models over action
    * vocabularies). `lead` pairs each event with its successor in ONE
    * user-keyed window pass — no self-join on (user, rank) — then a
    * pair-keyed aggregate folds the matrix; three exchanges total (the
    * window pass plus the two-exchange `count_distinct` rewrite), and
    * the matrix itself is |event types|² rows regardless of corpus size.
    * Ties within a timestamp are broken by event_id, the same total
    * order every other trace operator here uses (`ts` is native µs in
    * both engines since the round-8 fixture refresh). */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"))
  }

  val qMarkovTransitions: Q = (s, d) => markovTransitions(Tables.events(s, d))

  /** Per-user feature-store aggregate — the frequency/diversity/
    * monetary feature block ML pipelines materialize from raw traces:
    * first/last seen, event count, active-day and event-type
    * cardinalities, exact total value, and events-per-active-day. ONE
    * user-keyed aggregation pass; the two distincts ride Spark's
    * standard Expand rewrite (the q_agg_multi_distinct precedent), so
    * nothing shuffles but (user, partial) rows. The value sum is
    * decimal-cast before folding (double summation is
    * partition-order-dependent; exact decimal is not — §7.4), cast back
    * to double at the end; the rate is one IEEE divide of exact
    * integers. No wall-clock recency feature by design: §7.4 bans
    * wall-clock functions, so recency is expressed against the trace's
    * own last-seen edge. */
  def userFeatures(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts"), col("event_type"),
        to_date(col("ts")).as("day"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .as("v"))
      .groupBy("user_id")
      .agg(
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        count(lit(1)).as("n_events"),
        count_distinct(col("day")).as("n_days"),
        count_distinct(col("event_type")).as("n_types"),
        sum(col("v")).cast("double").as("total_value"))
      .withColumn("events_per_day",
        col("n_events").cast("double") / col("n_days").cast("double"))

  val qFeatureUser: Q = (s, d) => userFeatures(Tables.events(s, d))

  /** CEP-style sequence-pattern matching (the batch analog of Flink CEP /
    * MATCH_RECOGNIZE): each user's trace becomes a compact motif string —
    * one char per event, (ts, event_id) total order — and patterns are
    * plain regexes over it. Counted here: the conversion motif `cv*p`
    * (click, any views, then purchase, non-overlapping greedy scan) and
    * error occurrences. Scale shape: ONE user-keyed aggregate builds the
    * trace (collect_list of a narrow struct, map-side combinable;
    * per-user traces are session-scale, not corpus-scale), and the regex
    * scan is map-side codegen'd — no joins, no window, one exchange.
    * Exact: initials are distinct across the five event types, struct
    * sort order is the same total order every trace operator uses, and
    * greedy non-overlapping regex counting agrees across engines on
    * this alternation-free pattern. */
  def sequenceMotifs(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy("user_id")
      .agg(array_join(expr("transform(array_sort(collect_list(e)), x -> x.c)"),
        "").as("trace"))
      .select(col("user_id"),
        length(col("trace")).cast("int").as("trace_len"),
        regexp_count(col("trace"), lit("cv*p")).cast("int").as("n_conv"),
        regexp_count(col("trace"), lit("e")).cast("int").as("n_err"))

  val qPatternSequence: Q = (s, d) => sequenceMotifs(Tables.events(s, d))

  /** RFM segmentation — the classic customer-value rollup: per
    * customer, Recency (last order date), Frequency (order count),
    * Monetary (decimal-exact total), each banded into quintiles and
    * composed into a 3-digit segment code. Bands ride `ntile(5)` over
    * fully-ordered windows (unique custkey tiebreak → deterministic);
    * the windows run on the |customers|-row rollup, never the order
    * stream. At real scale the single-partition ntile sort becomes
    * approx-quantile cutoff joins (same bands, no global sort) — the
    * rollup-first shape is the part that carries over. */
  val qRfmSegments: Q = (s, d) => {
    val dec2 = "decimal(18,2)"
    val rollup = Tables.orders(s, d)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(dec2)).cast(dec2).as("monetary_dec"))
    val r = Window.orderBy(col("last_order").desc, col("o_custkey"))
    val f = Window.orderBy(col("n_orders").desc, col("o_custkey"))
    val m = Window.orderBy(col("monetary_dec").desc, col("o_custkey"))
    rollup
      .withColumn("r_band", ntile(5).over(r))
      .withColumn("f_band", ntile(5).over(f))
      .withColumn("m_band", ntile(5).over(m))
      .select(col("o_custkey"), col("last_order"), col("n_orders"),
        col("monetary_dec").cast("double").as("monetary"),
        col("r_band"), col("f_band"), col("m_band"),
        (col("r_band") * 100 + col("f_band") * 10 + col("m_band"))
          .as("rfm_code"))
  }

  /** Audience overlap matrix: distinct users per unordered event-type
    * pair — the co-engagement rollup behind segment targeting and
    * feature cross-correlation checks. The (user, type) distinct set is
    * ≤ |types| rows per user, so the user-keyed self-join fans out at
    * most |types|² per user (25 here) — bounded and skew-free; one
    * distinct shuffle + one pair-keyed count. */
  val qAudienceOverlap: Q = (s, d) => {
    val t = Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    t.select(col("user_id"), col("event_type").as("type_a"))
      .join(t.select(col("user_id"), col("event_type").as("type_b")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Pareto (value-concentration) curve: rank users by total spend
    * (cents), bucket into deciles by ntile(10) over (spend desc,
    * user_id), and read off each decile's share of total value in ppm
    * plus the cumulative share — the exact "do 20% of users carry 80%
    * of value" readout, the distributional companion to
    * [[graft.operators.FrontierOps]]'s Gini/HHI scalars (same
    * question, curve instead of index).
    *
    * Scale shape: one user-keyed rollup contracts the stream to
    * |users| rows; the global ntile/cumulative windows ride that
    * contraction — at petabyte event volume the windowed frame is the
    * user table, and if even that outgrew a single partition the
    * decile boundaries come from the weighted-percentile device
    * instead (declared). Headroom: cum·10⁶ in decimal(38) past 10²⁴
    * total cents. */
  val qParetoShare: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val spend = Tables.events(s, d)
      .select(col("user_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          * 100).cast("long").as("cents"))
      .groupBy(col("user_id")).agg(sum(col("cents")).as("spend"))
    val wRank = Window.orderBy(col("spend").desc, col("user_id"))
    val byDecile = spend
      .withColumn("decile", ntile(10).over(wRank))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("spend")).as("value"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile
      .withColumn("cum_value", sum(col("value")).over(wCum))
      .withColumn("total",
        sum(col("value")).over(Window.partitionBy()))
      .select(col("decile"), col("n_users"), col("value"),
        expr("""CASE WHEN total > 0 THEN
                CAST(CAST(value AS DECIMAL(38,0)) * 1000000 div total
                AS LONG) END""").as("share_ppm"),
        expr("""CASE WHEN total > 0 THEN
                CAST(CAST(cum_value AS DECIMAL(38,0)) * 1000000
                div total AS LONG) END""").as("cum_share_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_pareto_share" -> qParetoShare,
    "q_audience_overlap" -> qAudienceOverlap,
    "q_rfm_segments" -> qRfmSegments,
    "q_pattern_sequence" -> qPatternSequence,
    "q_funnel_steps" -> qFunnelSteps,
    "q_retention_cohort" -> qRetentionCohort,
    "q_cohort_ltv" -> qCohortLtv,
    "q_markov_transitions" -> qMarkovTransitions,
    "q_feature_user" -> qFeatureUser,
    "q_runs_consecutive" -> qRunsConsecutive)

  val oracleSql: Map[String, String] = Map(
    "q_pareto_share" ->
      """WITH spend AS (
           SELECT user_id,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS spend
           FROM events GROUP BY 1),
         dq AS (
           SELECT NTILE(10) OVER (ORDER BY spend DESC, user_id)
               AS decile, spend
           FROM spend),
         f AS (
           SELECT decile, COUNT(*) AS n_users, SUM(spend) AS value
           FROM dq GROUP BY 1),
         g AS (
           SELECT decile, n_users, value,
             SUM(value) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_value,
             SUM(value) OVER () AS total
           FROM f)
         SELECT CAST(decile AS INT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(value AS BIGINT) AS value,
           CASE WHEN total > 0 THEN
             CAST(CAST(value AS HUGEINT) * 1000000 // total AS BIGINT)
           END AS share_ppm,
           CASE WHEN total > 0 THEN
             CAST(CAST(cum_value AS HUGEINT) * 1000000 // total
               AS BIGINT) END AS cum_share_ppm
         FROM g ORDER BY decile""",
    "q_audience_overlap" ->
      """WITH t AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_users
         FROM t a JOIN t b ON a.user_id = b.user_id
           AND a.event_type < b.event_type
         GROUP BY a.event_type, b.event_type
         ORDER BY type_a, type_b""",
    "q_rfm_segments" ->
      """WITH r AS (
           SELECT o_custkey, MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS monetary_dec
           FROM orders WHERE o_custkey IS NOT NULL
           GROUP BY o_custkey),
         b AS (
           SELECT r.*,
             ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_band,
             ntile(5) OVER (ORDER BY n_orders DESC, o_custkey) AS f_band,
             ntile(5) OVER (ORDER BY monetary_dec DESC, o_custkey) AS m_band
           FROM r)
         SELECT o_custkey, last_order, n_orders,
           CAST(monetary_dec AS DOUBLE) AS monetary,
           r_band, f_band, m_band,
           r_band * 100 + f_band * 10 + m_band AS rfm_code
         FROM b ORDER BY o_custkey""",
    "q_pattern_sequence" ->
      """WITH t AS (
           SELECT user_id,
             string_agg(substring(event_type, 1, 1), ''
               ORDER BY ts, event_id) AS trace
           FROM events GROUP BY user_id)
         SELECT user_id,
           CAST(length(trace) AS INT) AS trace_len,
           CAST(len(regexp_extract_all(trace, 'cv*p')) AS INT) AS n_conv,
           CAST(len(regexp_extract_all(trace, 'e')) AS INT) AS n_err
         FROM t ORDER BY user_id""",
    "q_funnel_steps" ->
      """WITH u AS (
           SELECT user_id,
                  min(CASE WHEN event_type = 'signup' THEN ts END)
                    AS t_signup
           FROM events GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN u USING (user_id)
           WHERE e.event_type = 'click' AND e.ts >= u.t_signup
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
           GROUP BY e.user_id)
         SELECT
           (SELECT COUNT(*) FROM u WHERE t_signup IS NOT NULL) AS n_signup,
           (SELECT COUNT(*) FROM c) AS n_click,
           (SELECT COUNT(*) FROM p) AS n_purchase""",
    "q_retention_cohort" ->
      """WITH d AS (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         u AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id),
         r AS (
           SELECT d.user_id, u.cohort,
                  max(CASE WHEN d.day BETWEEN u.cohort + 1 AND u.cohort + 7
                      THEN 1 ELSE 0 END) AS retained
           FROM d JOIN u USING (user_id)
           GROUP BY d.user_id, u.cohort)
         SELECT cohort, COUNT(*) AS n_users,
                COUNT(*) FILTER (WHERE retained = 1) AS n_retained
         FROM r GROUP BY cohort ORDER BY cohort""",
    "q_cohort_ltv" ->
      """WITH b AS (
           SELECT user_id, event_type, CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events),
         u AS (SELECT user_id, MIN(day) AS cohort FROM b GROUP BY user_id),
         sz AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users
                FROM u GROUP BY cohort),
         cells AS (
           SELECT u.cohort,
             datediff('day', u.cohort, b.day) // 7 AS age_week,
             CAST(COUNT(*) AS BIGINT) AS n_purchases,
             SUM(CAST(b.cents AS HUGEINT)) AS value_cents
           FROM b JOIN u USING (user_id)
           WHERE b.event_type = 'purchase'
           GROUP BY 1, 2),
         c AS (
           SELECT cohort, age_week, n_purchases, value_cents,
             SUM(value_cents) OVER (PARTITION BY cohort ORDER BY age_week
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cents
           FROM cells)
         SELECT c.cohort, CAST(c.age_week AS BIGINT) AS age_week,
           sz.n_users, c.n_purchases,
           CAST(c.value_cents AS BIGINT) AS value_cents,
           CAST(c.cum_cents AS BIGINT) AS cum_cents,
           CAST(c.cum_cents * 1000 // sz.n_users AS BIGINT)
             AS ltv_milli_cents
         FROM c JOIN sz USING (cohort)
         ORDER BY c.cohort, c.age_week""",
    "q_feature_user" ->
      """SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS DOUBLE)
             AS events_per_day
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_markov_transitions" ->
      """WITH s AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events)
         SELECT event_type AS from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM s WHERE to_type IS NOT NULL
         GROUP BY from_type, to_type
         ORDER BY from_type, to_type""",
    "q_runs_consecutive" ->
      """WITH g AS (
           SELECT user_id, event_type, event_id,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS grp
           FROM events)
         SELECT user_id, event_type, COUNT(*) AS run_len,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
         FROM g GROUP BY user_id, event_type, grp
         ORDER BY user_id, min_event_id""")
}
