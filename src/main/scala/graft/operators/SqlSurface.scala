package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SQL-surface completions: the analytic-SQL idioms a reference user
  * coming from a warehouse dialect reaches for first — distribution
  * ranks, QUALIFY / DISTINCT ON dedup shapes, FILTERed aggregates,
  * correlated aggregate predicates, and NOT IN's null-aware semantics.
  *
  * Reference basis: the pandas post-processing in
  * dags/warsaw-delays.py:157-168 (rank/latest-row/threshold slicing done
  * imperatively there) — re-expressed as declarative window/agg plans.
  *
  * Scale notes: every window here partitions by a real key (status,
  * user, customer) — no global ORDER BY windows; the correlated-agg
  * predicate is computed as a grouped decimal rollup joined back (one
  * shuffle each side, AQE-broadcastable), not a per-row subquery; NOT IN
  * goes through Spark's null-aware anti join, which plans a broadcast of
  * the (small, filtered) value set.
  */
object SqlSurface {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)
  private val dec6 = DecimalType(18, 6)

  /** percent_rank / cume_dist per order status by price. Both are exact
    * small-integer ratios evaluated as ONE IEEE division — deterministic
    * and engine-identical (no accumulation order involved); the unique
    * orderkey tiebreak pins rank itself. */
  val qWindowPercentRank: Q = (s, d) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
  }

  /** first_value / last_value over the full-partition frame, plus the
    * IGNORE NULLS variant on a derived nullable column (view events
    * carry no value). The explicit UNBOUNDED..UNBOUNDED frame sidesteps
    * the classic last_value-with-default-frame trap — the default frame
    * ends at CURRENT ROW, which silently returns the current row's
    * value; tests pin the full-frame semantics in both engines. */
  val qWindowFirstLast: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .withColumn("nn_value",
        when(col("event_type") === "view", lit(null)).otherwise(col("value")))
      .select(col("event_id"), col("user_id"),
        first(col("value")).over(w).as("first_val"),
        last(col("value")).over(w).as("last_val"),
        first(col("nn_value"), ignoreNulls = true).over(w).as("first_nn"),
        last(col("nn_value"), ignoreNulls = true).over(w).as("last_nn"))
  }

  /** Conditional-count aggregates (count_if / FILTER clause): per event
    * type, how many events clear a value threshold, land in business
    * hours, or carry a big JSON k prop. One scan, map-side combinable —
    * the FILTER clause is sugar over the same partial-agg shape. */
  val qAggCountIf: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_if(col("value") > 50.0).as("n_high"),
        count_if(hour(col("ts")).between(9, 17)).as("n_business_hours"),
        count_if(get_json_object(col("props"), "$.k").cast("long") > 50L)
          .as("n_big_k"))

  /** QUALIFY shape — each customer's latest order, filtered on a window
    * rank in the same logical SELECT (Spark has no QUALIFY keyword; the
    * canonical plan is window + filter, which is exactly what QUALIFY
    * desugars to — the oracle states it with the keyword). */
  val qWindowQualify: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .filter(col("o_custkey").isNotNull)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
  }

  /** DISTINCT ON shape — each user's latest event (DuckDB/Postgres
    * DISTINCT ON (k) ... ORDER BY k, sort). Same keep-one-per-key plan
    * as QUALIFY but over the event stream with a timestamp sort and an
    * event_id tiebreak. */
  val qDistinctOn: Q = (s, d) => {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "ts", "event_type")
  }

  /** Correlated aggregate predicate — orders above 2× their own
    * customer's average order value. The correlation is decorrelated by
    * hand into a grouped decimal-exact average joined back on the key
    * (what Catalyst's RewriteCorrelatedScalarSubquery would produce);
    * the average divides once at DECIMAL(18,6) so the comparison is
    * engine-exact. */
  val qCorrelatedAgg: Q = (s, d) => {
    // r18 A/B, ACCEPTED THEN REVERTED after a final-plan audit: an
    // explicit repartition(o_custkey) on both consumers measured ~2× at
    // the 10× mirror (0.95–1.38 s vs 1.96–2.36, twice) — but
    // graft.tools.ExplainFinal showed the runtime plan still scans
    // twice, still broadcasts the rollup, and the exchanges do NOT
    // reuse (different column prunings): the entire "win" was the
    // repartition giving the single-row-group fixture scan 32-way
    // parallelism for the partial aggregate and the BHJ probe — the
    // repartition-after-scan device r17 ruled scale-hostile, measured
    // in disguise. At scale the extra full-stream exchange is a pure
    // regression in the broadcastable regime and a wash past it. The
    // rollup + runtime-broadcast join-back form stands. (Contrast q20
    // and q_basket_rules, whose repartitions REMOVE exchanges from the
    // plan — verified in the census — rather than adding one.)
    val ord = Tables.orders(s, d).filter(col("o_custkey").isNotNull)
    val avgByCust = ord.groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast(dec2)) / count(lit(1)))
        .cast(dec6).as("avg_price"))
    ord.join(avgByCust, Seq("o_custkey"))
      .filter(col("o_totalprice").cast(dec2) >
        lit(2).cast(dec2) * col("avg_price"))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("avg_price").cast("double").as("cust_avg_price"))
  }

  /** NOT IN (subquery) with a NULLABLE probe column — the three-valued
    * logic trap: a NULL probe compares UNKNOWN against every set element
    * and the row is dropped (unlike a left_anti join, which would keep
    * it). The fixture carries no organic NULLs, so the probe derives one
    * deterministically (every 100th order); identically in the oracle.
    * Declared through spark.sql so Catalyst plans its null-aware anti
    * join; the value set (negative-balance customers) is filtered small
    * and broadcast. */
  val qNotInNulls: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("nin_orders")
    Tables.customer(s, d).createOrReplaceTempView("nin_customer")
    s.sql("""
      SELECT o_orderkey, probe_custkey, o_totalprice
      FROM (SELECT o_orderkey, o_totalprice,
              CASE WHEN o_orderkey % 100 = 0 THEN NULL
                   ELSE o_custkey END AS probe_custkey
            FROM nin_orders)
      WHERE probe_custkey NOT IN
        (SELECT c_custkey FROM nin_customer WHERE c_acctbal < 0)
        AND o_totalprice > 150000.0
    """)
  }

  /** Running DISTINCT count over an ordered window — a feature no SQL
    * engine gives natively (COUNT(DISTINCT) OVER is unsupported), so
    * the canonical workaround: a windowed set accumulation sized at the
    * end (`size(collect_set())`). Per user, how many distinct event
    * types seen so far. Scale note: the set state is bounded by the
    * event-type domain (5 here) — for high-cardinality columns swap in
    * the sketch variant (approx HLL partials, q_agg_hll_merge) rather
    * than an unbounded set. */
  val qWindowDistinctRunning: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        size(collect_set(col("event_type")).over(w)).as("n_types_seen"))
  }

  /** Modern grouping sugar in one statement: `SELECT * EXCEPT (...)`
    * column pruning plus `GROUP BY ALL` / `ORDER BY ALL` (Spark 4 and
    * DuckDB both resolve the non-aggregate output columns as the
    * grouping key — the sugar desugars to the identical hash-agg plan,
    * so this is a parser-surface query, not a new operator). DuckDB's
    * star-prune spelling is `EXCLUDE`; the oracle uses it. */
  val qGroupbyAll: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("ga_events")
    s.sql(
      """SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM (SELECT * EXCEPT (props) FROM ga_events)
         GROUP BY ALL ORDER BY ALL""")
  }

  val queries: Map[String, Q] = Map(
    "q_groupby_all" -> qGroupbyAll,
    "q_window_distinct_running" -> qWindowDistinctRunning,
    "q_window_percent_rank" -> qWindowPercentRank,
    "q_window_first_last" -> qWindowFirstLast,
    "q_agg_count_if" -> qAggCountIf,
    "q_window_qualify" -> qWindowQualify,
    "q_distinct_on" -> qDistinctOn,
    "q_correlated_agg" -> qCorrelatedAgg,
    "q_not_in_nulls" -> qNotInNulls)

  val oracleSql: Map[String, String] = Map(
    "q_groupby_all" ->
      """SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM (SELECT * EXCLUDE (props) FROM events)
         GROUP BY ALL ORDER BY ALL""",
    "q_window_distinct_running" ->
      """SELECT event_id, user_id,
           CAST(len(list_distinct(list(event_type) OVER w)) AS INT)
             AS n_types_seen
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "q_window_percent_rank" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice ASC, o_orderkey ASC)""",
    "q_window_first_last" ->
      """SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER w AS last_val,
           first_value(nn_value IGNORE NULLS) OVER w AS first_nn,
           last_value(nn_value IGNORE NULLS) OVER w AS last_nn
         FROM (SELECT *, CASE WHEN event_type = 'view' THEN NULL
                              ELSE value END AS nn_value FROM events)
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)""",
    "q_agg_count_if" ->
      """SELECT event_type, COUNT(*) AS n,
           COUNT(*) FILTER (WHERE value > 50.0) AS n_high,
           COUNT(*) FILTER (WHERE EXTRACT(hour FROM ts) BETWEEN 9 AND 17)
             AS n_business_hours,
           COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k')
             AS BIGINT) > 50) AS n_big_k
         FROM events GROUP BY event_type""",
    "q_window_qualify" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
         FROM orders
         WHERE o_custkey IS NOT NULL
         QUALIFY row_number() OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""",
    "q_distinct_on" ->
      """SELECT DISTINCT ON (user_id) user_id, event_id, ts, event_type
         FROM events ORDER BY user_id, ts DESC, event_id DESC""",
    "q_correlated_agg" ->
      """WITH a AS (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / COUNT(*)
               AS DECIMAL(18,6)) AS avg_price
           FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey)
         SELECT o.o_custkey, o.o_orderkey, o.o_totalprice,
           CAST(a.avg_price AS DOUBLE) AS cust_avg_price
         FROM orders o JOIN a ON o.o_custkey = a.o_custkey
         WHERE CAST(o.o_totalprice AS DECIMAL(18,2))
           > CAST(2 AS DECIMAL(18,2)) * a.avg_price""",
    "q_not_in_nulls" ->
      """SELECT o_orderkey, probe_custkey, o_totalprice
         FROM (SELECT o_orderkey, o_totalprice,
                 CASE WHEN o_orderkey % 100 = 0 THEN NULL
                      ELSE o_custkey END AS probe_custkey
               FROM orders)
         WHERE probe_custkey NOT IN
           (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
           AND o_totalprice > 150000.0""")
}
