package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Scans, projections, filters, joins, set ops, sorts (SURVEY.md §2.2).
  *
  * Every query follows the determinism contract of SURVEY.md §7.4: total
  * `ORDER BY` ending in a unique key, explicit aliases on every computed
  * column (the driver's hash compare includes column names), no wall-clock
  * functions.
  *
  * Scale notes (100 TB): all filters/projections here are Catalyst-pushable
  * to the parquet scan; dimension joins (`region`, `nation`, `part`,
  * `customer`) are broadcast-sized or become so after filtering, so the big
  * fact tables (`lineitem`, `orders`, `events`) never shuffle for them.
  */
object CoreQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---- scans / projections / filters ------------------------------------

  /** Full-table scan, all columns, totally ordered.
    * Reference basis: verbatim table re-upload (dags/warsaw-gtfs.py:88-96). */
  val qScanFull: Q = (s, d) =>
    Tables.region(s, d).orderBy("r_regionkey")

  /** Column pruning + rename. Reference basis: checkbox-column skip
    * (dags/warsaw-delays.py:141). At scale: ReadSchema must contain only the
    * four referenced columns. */
  val qProjection: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
      // sort by every output column so ties are identical rows

  /** Compound predicate AND/OR/IN/BETWEEN/LIKE — all parquet-pushable.
    * Reference basis: empty-row filter (dags/warsaw-delays.py:156). */
  val qFilterPred: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("O", "F")
        && col("o_totalprice").between(50000d, 200000d)
        && (col("o_orderpriority").like("1%") || col("o_orderpriority").like("5%")))
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"))

  /** Null-handling: when/otherwise derivation, isNotNull filter, coalesce.
    * Reference basis: missing-hash branch (dags/warsaw-gtfs.py:66-67). */
  val qFilterNull: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") =!= "O", col("o_totalprice")).as("maybe_price"))
      .filter(col("maybe_price").isNotNull)
      .select(col("o_orderkey"),
        coalesce(col("maybe_price"), lit(0.0)).as("price"))

  /** 4-way CASE precedence decode, mirroring the chip>link>span>text
    * extraction precedence (dags/warsaw-delays.py:145-154). */
  val qCasePrecedence: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        when(col("event_type") === "error", "problem")
          .when(col("event_type") === "signup", "growth")
          .when(col("event_type") === "purchase", "revenue")
          .otherwise("engagement").as("category"))

  // ---- joins ------------------------------------------------------------

  /** Inner equi-join orders ⋈ customer. At sf the customer side broadcasts
    * (AQE / threshold); at 100 TB both sides shuffle on the key — which is
    * fine: it is the join key's natural hash partitioning. */
  val qJoinInner: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice"))
  }

  /** The DECLARED broadcast()-hint API surface: an explicit broadcast
    * join of lineitem with `part`, pinned so the hint's semantics stay
    * covered. NOTE part scales with SF (200k×SF), so at lake scale this
    * hint must come off — [[qJoinInner]] is the unhinted sibling whose
    * strategy the planner/AQE sizes adaptively; this query is the API
    * demonstration, not the scale pattern (allowlisted with that
    * rationale in PlanQualitySpec's broadcast guard). */
  val qJoinBroadcast: Q = (s, d) => {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("p_name"), col("p_brand"))
      // non-unique (l_orderkey, l_linenumber) → total order over all cols
  }

  /** Left outer + count per customer, order-less customers included with 0.
    * Reference basis: absent-right-side branch (dags/warsaw-gtfs.py:66-67). */
  val qJoinLeft: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  /** Full outer join of partially-overlapping keyed slices; nulls appear on
    * both sides. COALESCE of the two unique keys gives a total order. */
  val qJoinFull: Q = (s, d) => {
    val left = Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(2L)) === 0)
      .select(col("c_custkey").as("lkey"), col("c_name"))
    val right = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      .filter(pmod(col("o_custkey"), lit(3L)) === 0)
      .select(col("o_custkey").as("rkey"), col("n_orders"))
    left.join(right, col("lkey") === col("rkey"), "full_outer")
  }

  /** Left semi = EXISTS. Reference basis: blob-existence check
    * (dags/warsaw-weather.py:28). */
  val qJoinSemi: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Left anti = NOT EXISTS — the reference's change-detection primitive
    * (hash-differs branch, dags/warsaw-gtfs.py:68-71). The right side is
    * filtered (big orders only) so the anti set is non-empty at every sf. */
  val qJoinAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Cross join of the two tiny dims (5×25 rows) — the dates×files fan-out
    * product (dags/warsaw-gtfs.py:90,107). Never do this on facts. */
  val qJoinCross: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_regionkey"), col("n_nationkey"), col("r_name"), col("n_name"))

  /** Theta join: equi part (nationkey) + range part (acctbal <). The equi
    * conjunct keeps it a hash/merge join — never a cartesian. */
  val qJoinThetaRange: Q = (s, d) => {
    val sup = Tables.supplier(s, d)
    val c = Tables.customer(s, d)
    sup.join(c, sup("s_nationkey") === c("c_nationkey")
        && sup("s_acctbal") < c("c_acctbal"))
      .select(col("s_suppkey"), col("c_custkey"), col("s_acctbal"), col("c_acctbal"))
  }

  /** As-of join: for each `error` event, the most recent strictly-prior
    * `signup`/`purchase` by the same user (ties broken by event_id).
    *
    * Spark has no native as-of join; rather than a custom SparkStrategy we
    * express it as a *plan shape* (SURVEY.md §4.3): union both sides,
    * window-sort per user by (ts, event_id), and take
    * `last(right_id, ignoreNulls)` over the strictly-preceding frame. One
    * shuffle on user_id, no range explosion — this shape survives 100 TB
    * because state per user is O(1) in the running window.
    * Reference basis: "latest snapshot" semantics of latest-feed-hash
    * (dags/warsaw-gtfs.py:65-71). */
  val qJoinAsof: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("error", "signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(col("event_type").isin("signup", "purchase"), col("event_id")).as("r_id"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("prior_event_id", last(col("r_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("prior_event_id"))
  }

  /** FORWARD as-of: each error pairs with the NEXT signup/purchase by
    * the same user strictly after it in the trace order — the
    * `merge_asof(direction='forward')` semantics ("what happened after
    * the failure"), completing the as-of family (backward, backward
    * + tolerance, forward). Same single-exchange shape mirrored: the
    * running window flips to a FOLLOWING frame and `first(ignoreNulls)`
    * picks the earliest partner — still one user-keyed exchange, O(1)
    * frame state, never an events self-join. */
  val qJoinAsofForward: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("error", "signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(col("event_type").isin("signup", "purchase"), col("event_id")).as("r_id"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(1, Window.unboundedFollowing)
    ev.withColumn("next_event_id", first(col("r_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("next_event_id"))
  }

  /** [[qJoinAsof]] with a staleness TOLERANCE (pandas `merge_asof
    * tolerance=` semantics): the match is kept only when the most recent
    * prior partner is within 1 hour of the probe — otherwise nulled,
    * with a `fresh` flag either way. Because the as-of partner is by
    * definition the LATEST prior row, "latest within tolerance" and
    * "latest, if within tolerance" coincide, so the tolerance is one
    * more windowed column (the partner's ts) plus a map-side interval
    * test — the plan keeps the single user-keyed window shuffle. */
  val qJoinAsofTolerance: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("error", "signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(col("event_type").isin("signup", "purchase"), col("event_id")).as("r_id"),
        when(col("event_type").isin("signup", "purchase"), col("ts")).as("r_ts"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("p_id", last(col("r_id"), ignoreNulls = true).over(w))
      .withColumn("p_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .withColumn("fresh", coalesce(
        col("p_ts") >= col("ts") - expr("INTERVAL 1 HOUR"), lit(false)))
      .select(col("event_id"), col("user_id"),
        when(col("fresh"), col("p_id")).as("prior_event_id"),
        col("fresh"))
  }

  /** NEAREST as-of (pandas `merge_asof(direction='nearest')`),
    * completing the family: each error pairs with whichever partner —
    * latest prior or earliest next — is closer in absolute event time,
    * ties to the prior side. Both directional windows share ONE
    * user-keyed sort (Catalyst plans them in a single Window operator
    * chain over the same exchange); the nearest pick is a map-side
    * integer-µs comparison. */
  val qJoinAsofNearest: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("error", "signup", "purchase"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        when(col("event_type").isin("signup", "purchase"), col("event_id")).as("r_id"),
        when(col("event_type").isin("signup", "purchase"),
          unix_micros(col("ts"))).as("r_us"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val back = w.rowsBetween(Window.unboundedPreceding, -1)
    val fwd = w.rowsBetween(1, Window.unboundedFollowing)
    ev
      .withColumn("p_id", last(col("r_id"), ignoreNulls = true).over(back))
      .withColumn("p_us", last(col("r_us"), ignoreNulls = true).over(back))
      .withColumn("n_id", first(col("r_id"), ignoreNulls = true).over(fwd))
      .withColumn("n_us", first(col("r_us"), ignoreNulls = true).over(fwd))
      .filter(col("event_type") === "error")
      .withColumn("d_p", unix_micros(col("ts")) - col("p_us"))
      .withColumn("d_n", col("n_us") - unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        when(col("p_id").isNull && col("n_id").isNull, lit(null))
          .when(col("n_id").isNull, col("p_id"))
          .when(col("p_id").isNull, col("n_id"))
          .when(col("d_p") <= col("d_n"), col("p_id"))
          .otherwise(col("n_id")).as("nearest_event_id"),
        when(col("p_id").isNull && col("n_id").isNull, lit(null))
          .when(col("n_id").isNull, lit("prior"))
          .when(col("p_id").isNull, lit("next"))
          .when(col("d_p") <= col("d_n"), lit("prior"))
          .otherwise(lit("next")).as("side"))
  }

  // ---- set operations ---------------------------------------------------

  /** UNION ALL of two event slices — append-only snapshot accumulation
    * (dags/warsaw-weather.py:21). */
  val qUnionAll: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
    ev.filter(col("event_type") === "click")
      .unionByName(ev.filter(col("event_type") === "view"))
  }

  /** UNION (distinct) of two user-id sets. */
  val qUnionDistinct: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "click").select(col("user_id").as("key"))
      .union(ev.filter(col("value") > 150d).select(col("user_id").as("key")))
      .distinct()
  }

  /** INTERSECT: customers in a segment who also placed orders —
    * unchanged-feed equality semantics (dags/warsaw-gtfs.py:71). */
  val qIntersect: Q = (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("key"))
      .intersect(Tables.orders(s, d).select(col("o_custkey").as("key")))

  /** EXCEPT: snapshot diff, the file-level analog of change detection
    * (dags/warsaw-gtfs.py:60-71). */
  val qExcept: Q = (s, d) =>
    Tables.orders(s, d).filter(col("o_totalprice") > 300000d)
      .select(col("o_custkey").as("key"))
      .except(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key")))

  /** EXCEPT ALL — bag-semantics difference: each (event_type, user_id)
    * occurrence above the low threshold minus one occurrence per match
    * above the high threshold (multiplicity = max(0, m−n), vs EXCEPT's
    * set semantics). Spark plans the standard rewrite: a count-tagged
    * union aggregated on the key, then a generator re-expanding the
    * surviving multiplicities — one shuffle, no join. */
  val qExceptAll: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.filter(col("value") > 50d).select("event_type", "user_id")
      .exceptAll(ev.filter(col("value") > 80d)
        .select("event_type", "user_id"))
  }

  /** INTERSECT ALL — bag-semantics intersection (multiplicity =
    * min(m, n)); the companion surface to [[qExceptAll]]. */
  val qIntersectAll: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.filter(col("value") > 50d).select("event_type", "user_id")
      .intersectAll(ev.filter(col("value") > 80d)
        .select("event_type", "user_id"))
  }

  // ---- sorts / top-k ----------------------------------------------------

  /** Multi-key sort, mixed asc/desc, unique tiebreaker. */
  val qSortMulti: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderpriority").desc, col("o_orderstatus").asc,
        col("o_orderkey").asc)

  /** Explicit NULLS LAST ordering on a derived nullable key (Spark ASC
    * defaults NULLS FIRST, DuckDB NULLS LAST — both made explicit,
    * SURVEY.md §7.4 rule 3). */
  val qSortNulls: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "P", col("o_totalprice")).as("p_price"))
      .orderBy(col("p_price").asc_nulls_last, col("o_orderkey").asc)

  /** LIMIT with OFFSET pagination (deterministic: total order first). */
  val qLimitOffset: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
      .offset(5)
      .limit(10)

  /** Global top-10 — planned as TakeOrderedAndProject (no full sort, no
    * single-node materialization of the input). */
  val qTopk: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(10)

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_scan_full" -> qScanFull,
    "q_projection" -> qProjection,
    "q_filter_pred" -> qFilterPred,
    "q_filter_null" -> qFilterNull,
    "q_case_precedence" -> qCasePrecedence,
    "q_join_inner" -> qJoinInner,
    "q_join_broadcast" -> qJoinBroadcast,
    "q_join_left" -> qJoinLeft,
    "q_join_full" -> qJoinFull,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_cross" -> qJoinCross,
    "q_join_theta_range" -> qJoinThetaRange,
    "q_join_asof" -> qJoinAsof,
    "q_join_asof_forward" -> qJoinAsofForward,
    "q_join_asof_tolerance" -> qJoinAsofTolerance,
    "q_join_asof_nearest" -> qJoinAsofNearest,
    "q_union_all" -> qUnionAll,
    "q_union_distinct" -> qUnionDistinct,
    "q_intersect" -> qIntersect,
    "q_except" -> qExcept,
    "q_except_all" -> qExceptAll,
    "q_intersect_all" -> qIntersectAll,
    "q_sort_multi" -> qSortMulti,
    "q_sort_nulls" -> qSortNulls,
    "q_limit_offset" -> qLimitOffset,
    "q_topk" -> qTopk)

  val oracleSql: Map[String, String] = Map(
    "q_scan_full" ->
      "SELECT * FROM region ORDER BY r_regionkey",
    "q_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty,
         l_extendedprice AS price
         FROM lineitem ORDER BY l_orderkey, l_linenumber, qty, price""",
    "q_filter_pred" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
         FROM orders
         WHERE o_orderstatus IN ('O','F')
           AND o_totalprice BETWEEN 50000 AND 200000
           AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '5%')
         ORDER BY o_orderkey""",
    "q_filter_null" ->
      """SELECT o_orderkey, COALESCE(maybe_price, 0.0) AS price FROM
         (SELECT o_orderkey,
            CASE WHEN o_orderstatus <> 'O' THEN o_totalprice END AS maybe_price
          FROM orders)
         WHERE maybe_price IS NOT NULL ORDER BY o_orderkey""",
    "q_case_precedence" ->
      """SELECT event_id, event_type,
           CASE WHEN event_type = 'error' THEN 'problem'
                WHEN event_type = 'signup' THEN 'growth'
                WHEN event_type = 'purchase' THEN 'revenue'
                ELSE 'engagement' END AS category
         FROM events ORDER BY event_id""",
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_name, p_brand
         FROM lineitem JOIN part ON l_partkey = p_partkey
         ORDER BY l_orderkey, l_linenumber, p_name, p_brand""",
    "q_join_left" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_full" ->
      """SELECT l.lkey, l.c_name, r.rkey, r.n_orders FROM
         (SELECT c_custkey AS lkey, c_name FROM customer
          WHERE c_custkey % 2 = 0) l
         FULL OUTER JOIN
         (SELECT o_custkey AS rkey, COUNT(*) AS n_orders FROM orders
          GROUP BY o_custkey HAVING o_custkey % 3 = 0) r
         ON l.lkey = r.rkey
         ORDER BY COALESCE(l.lkey, r.rkey)""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_totalprice > 400000)
         ORDER BY c_custkey""",
    "q_join_cross" ->
      """SELECT r_regionkey, n_nationkey, r_name, n_name
         FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""",
    "q_join_theta_range" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
         FROM supplier JOIN customer
           ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
         ORDER BY s_suppkey, c_custkey""",
    "q_join_asof" ->
      """SELECT e.event_id, e.user_id,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = e.user_id
              AND p.event_type IN ('signup','purchase')
              AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
            ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS prior_event_id
         FROM events e WHERE e.event_type = 'error'
         ORDER BY e.event_id""",
    "q_join_asof_forward" ->
      """SELECT e.event_id, e.user_id,
           (SELECT p.event_id FROM events p
            WHERE p.user_id = e.user_id
              AND p.event_type IN ('signup','purchase')
              AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id))
            ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS next_event_id
         FROM events e WHERE e.event_type = 'error'
         ORDER BY e.event_id""",
    "q_join_asof_tolerance" ->
      """WITH m AS (
           SELECT e.event_id, e.user_id,
             (SELECT p.event_id FROM events p
              WHERE p.user_id = e.user_id
                AND p.event_type IN ('signup','purchase')
                AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
              ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS p_id,
             (SELECT p.ts FROM events p
              WHERE p.user_id = e.user_id
                AND p.event_type IN ('signup','purchase')
                AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
              ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS p_ts,
             e.ts
           FROM events e WHERE e.event_type = 'error')
         SELECT event_id, user_id,
           CASE WHEN p_ts >= ts - INTERVAL 1 HOUR THEN p_id END
             AS prior_event_id,
           COALESCE(p_ts >= ts - INTERVAL 1 HOUR, false) AS fresh
         FROM m ORDER BY event_id""",
    "q_join_asof_nearest" ->
      """WITH m AS (
           SELECT e.event_id, e.user_id, e.ts,
             (SELECT p.event_id FROM events p
              WHERE p.user_id = e.user_id
                AND p.event_type IN ('signup','purchase')
                AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
              ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS p_id,
             (SELECT p.ts FROM events p
              WHERE p.user_id = e.user_id
                AND p.event_type IN ('signup','purchase')
                AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
              ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) AS p_ts,
             (SELECT p.event_id FROM events p
              WHERE p.user_id = e.user_id
                AND p.event_type IN ('signup','purchase')
                AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id))
              ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS n_id,
             (SELECT p.ts FROM events p
              WHERE p.user_id = e.user_id
                AND p.event_type IN ('signup','purchase')
                AND (p.ts > e.ts OR (p.ts = e.ts AND p.event_id > e.event_id))
              ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) AS n_ts
           FROM events e WHERE e.event_type = 'error')
         SELECT event_id, user_id,
           CASE WHEN p_id IS NULL AND n_id IS NULL THEN NULL
                WHEN n_id IS NULL THEN p_id
                WHEN p_id IS NULL THEN n_id
                WHEN epoch_us(ts) - epoch_us(p_ts)
                     <= epoch_us(n_ts) - epoch_us(ts) THEN p_id
                ELSE n_id END AS nearest_event_id,
           CASE WHEN p_id IS NULL AND n_id IS NULL THEN NULL
                WHEN n_id IS NULL THEN 'prior'
                WHEN p_id IS NULL THEN 'next'
                WHEN epoch_us(ts) - epoch_us(p_ts)
                     <= epoch_us(n_ts) - epoch_us(ts) THEN 'prior'
                ELSE 'next' END AS side
         FROM m ORDER BY event_id""",
    "q_union_all" ->
      """SELECT event_id, user_id, event_type FROM events WHERE event_type = 'click'
         UNION ALL
         SELECT event_id, user_id, event_type FROM events WHERE event_type = 'view'
         ORDER BY event_id""",
    "q_union_distinct" ->
      """SELECT user_id AS key FROM events WHERE event_type = 'click'
         UNION
         SELECT user_id AS key FROM events WHERE value > 150
         ORDER BY key""",
    "q_intersect" ->
      """SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS key FROM orders
         ORDER BY key""",
    "q_except" ->
      """SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000
         EXCEPT
         SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
         ORDER BY key""",
    "q_except_all" ->
      """SELECT event_type, user_id FROM events WHERE value > 50
         EXCEPT ALL
         SELECT event_type, user_id FROM events WHERE value > 80
         ORDER BY event_type, user_id""",
    "q_intersect_all" ->
      """SELECT event_type, user_id FROM events WHERE value > 50
         INTERSECT ALL
         SELECT event_type, user_id FROM events WHERE value > 80
         ORDER BY event_type, user_id""",
    "q_sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_orderstatus, o_totalprice
         FROM orders
         ORDER BY o_orderpriority DESC, o_orderstatus ASC, o_orderkey ASC""",
    "q_sort_nulls" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice END AS p_price
         FROM orders
         ORDER BY p_price ASC NULLS LAST, o_orderkey ASC""",
    "q_limit_offset" ->
      """SELECT c_custkey, c_name FROM customer
         ORDER BY c_custkey LIMIT 10 OFFSET 5""",
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 10""")
}
