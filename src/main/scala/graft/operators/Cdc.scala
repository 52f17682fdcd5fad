package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data-capture merge: upsert a delta batch into a base snapshot,
  * latest version wins per key — the row-level generalization of the
  * reference's feed-level change detection (`dags/warsaw-gtfs.py:60-71`:
  * keep the latest feed, skip unchanged). Every incremental 100 TB corpus
  * refresh is this operation at document granularity.
  *
  * Two physical strategies, same semantics:
  *   - [[mergeUpsert]]: union + per-key window. One shuffle on the key —
  *     the right shape when |delta| ~ |base| (both sides reshuffle anyway,
  *     and AQE splits skewed keys).
  *   - [[mergeUpsertSmallDelta]]: broadcast anti-join + union. ZERO
  *     shuffle of the base when the delta's keys fit in a broadcast —
  *     the common nightly-increment shape (delta ≪ base). The base
  *     streams through a BroadcastHashJoin and appends the delta.
  * `CdcSpec` property-tests the two paths equal on randomized batches.
  */
object Cdc {

  /** Latest-wins merge via per-key window. Ties on `versionCol` break
    * toward the delta row (deterministic). */
  def mergeUpsert(base: DataFrame, delta: DataFrame, keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val unioned = base.withColumn("_src", lit(0))
      .unionByName(delta.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    unioned.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_src")
  }

  /** Latest-wins merge assuming every delta row supersedes the base row
    * with the same key (the snapshot-refresh contract): anti-join the
    * base against the delta key set, then append the delta. The key set
    * carries NO broadcast hint — a delta is bounded per micro-batch
    * operationally, not structurally, so AQE broadcasts it at runtime
    * when it fits (no shuffle of the base side) and a backfill-sized
    * delta falls back to the keyed shuffle instead of an OOM. */
  def mergeUpsertSmallDelta(base: DataFrame, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val deltaKeys = delta.select(keyCols.map(col): _*).distinct()
    base.join(deltaKeys, keyCols, "left_anti")
      .unionByName(delta)
  }

  /** SCD Type-2 history: from append-only versioned rows per key, derive
    * effective-dated intervals — `valid_from` = this row's order value,
    * `valid_to` = the next row's (NULL while current). One window shuffle
    * on the key; at 100 TB this is the standard "latest + history" dual
    * view built once per refresh. */
  def scd2History(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  type Q = (SparkSession, String) => DataFrame

  /** Declared CDC merge: base = all orders at version 1; delta = updates
    * (every 3rd key, re-priced, status 'U') + inserts (every 7th key
    * offset into fresh key space, status 'N') at version 2. Upsert via
    * the no-base-shuffle broadcast path. */
  val qMergeUpsert: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val base = o.withColumn("version", lit(1))
    val updates = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + lit(100.0)).as("o_totalprice"),
        lit(2).as("version"))
    val inserts = o.filter(col("o_orderkey") % 7 === 0)
      .select((col("o_orderkey") + lit(1000000L)).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"),
        lit(2).as("version"))
    mergeUpsertSmallDelta(base, updates.unionByName(inserts),
      Seq("o_orderkey"))
  }

  /** Declared SCD2: each user's event stream as effective-dated state
    * history (each event supersedes the previous at its timestamp). */
  val qScd2History: Q = (s, d) =>
    scd2History(Tables.events(s, d), Seq("user_id"), "ts", Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))

  /** Point-in-time (temporal) join: each probe row joins the ONE
    * dimension version whose [valid_from, valid_to) interval contains its
    * timestamp — "what did we believe about this entity when the fact
    * happened", the standard time-travel read over an SCD2 dimension.
    * Here: each purchase joins the user's view-state current at purchase
    * time.
    *
    * Scale shape: an equi-join on the entity key carries the shuffle; the
    * interval predicate is a post-join filter over that user's few
    * versions (never a range cross product). SCD2 intervals are disjoint
    * and contiguous per key, so at most one version matches — the join
    * cannot fan out. */
  val qJoinTemporal: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val dim = scd2History(ev.filter(col("event_type") === "view"),
      Seq("user_id"), "ts", Seq("event_id"))
      .select(col("user_id"), col("event_id").as("state_event_id"),
        col("value").as("state_value"),
        col("valid_from"), col("valid_to"))
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_event_id"), col("user_id"), col("ts"))
      .join(dim, Seq("user_id"))
      .filter(col("ts") >= col("valid_from") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("p_event_id"), col("user_id"),
        col("state_event_id"), col("state_value"))
  }

  /** Incremental aggregate maintenance: fold a delta batch into a
    * materialized rollup WITHOUT recomputing from the raw table — the
    * property that lets a 100 TB lake keep daily rollups fresh for the
    * cost of the delta. Counts and sums are mergeable: state ⊕ delta is
    * a full-outer join on the group key with coalesced partial sums
    * (groups new in the delta appear, untouched groups pass through).
    * The declared query splits the fixture by event_id parity —
    * "yesterday's" state aggregated from even ids, the delta from odd —
    * and the oracle is the FULL recompute over all events: incremental
    * maintenance must be indistinguishable from it. */
  /** Exact decimal scale every rollup producer/consumer must share. */
  val rollupDec = org.apache.spark.sql.types.DecimalType(18, 2)

  /** THE (count, decimal-sum-of-value) rollup pass — the single
    * definition of the partials that [[rollupMaintain]], the declared
    * incremental query, and the streaming form
    * (graft.streaming.EventStream.streamRollupPartials) all consume.
    * One shared body is what makes "state ⊕ delta ≡ full recompute"
    * a structural guarantee rather than four copies that must not
    * drift. */
  def rollupAgg(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(rollupDec)).cast(rollupDec).as("s"))

  def rollupMaintain(state: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val dec2 = rollupDec
    val deltaAgg = rollupAgg(delta, keys)
      .withColumnsRenamed(Map("n" -> "d_n", "s" -> "d_sum"))
    state.join(deltaAgg, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n"),
        (coalesce(col("s"), lit(0).cast(dec2))
          + coalesce(col("d_sum"), lit(0).cast(dec2)))
          .cast(dec2).as("s")): _*)
  }

  val qRollupIncremental: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("day", to_date(col("ts")))
    // decimal partials (§7.4): exact and associative, so state ⊕ delta
    // is bit-identical to the full recompute no matter how the corpus
    // was split across batches or partitions
    val state = rollupAgg(ev.filter(col("event_id") % 2 === 0),
      Seq("day", "event_type"))
    val delta = ev.filter(col("event_id") % 2 === 1)
    rollupMaintain(state, delta, Seq("day", "event_type"))
      .select(col("day"), col("event_type"), col("n"),
        col("s").cast("double").as("s"))
  }

  /** Incremental maintenance of a JOIN view from delta batches — the
    * join sibling of [[rollupMaintain]]. For base/delta splits of both
    * inputs, the delta identity
    *
    *   (A ∪ dA) ⋈ (B ∪ dB) = A⋈B ∪ dA⋈B ∪ A⋈dB ∪ dA⋈dB
    *
    * lets a refresh touch only delta-sized joins: at 100 TB the A⋈B
    * term IS the stored view (not recomputed — here it stands in as
    * the fourth term so the declared query is self-contained), and the
    * three delta terms each join a small batch against one bucketed
    * base table, broadcast on the delta side. Exactness: union of
    * equi-joins over disjoint row splits — no arithmetic at all.
    * Deterministic splits: orders by orderkey mod, lineitem by
    * linenumber, so every term is non-empty and the splits are
    * independent of each other. */
  def joinDeltaView(ordBase: DataFrame, ordDelta: DataFrame,
      liBase: DataFrame, liDelta: DataFrame): DataFrame = {
    def j(o: DataFrame, l: DataFrame): DataFrame =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
    j(ordBase, liBase)
      .unionAll(j(ordDelta, liBase))
      .unionAll(j(ordBase, liDelta))
      .unionAll(j(ordDelta, liDelta))
  }

  /** Declared query: the delta-maintained orders⋈lineitem view — the
    * four-term union must equal the direct join row-for-row (the oracle
    * states the direct join). */
  val qJoinDeltaView: Q = (s, d) => {
    val ord = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val view = joinDeltaView(
      ord.filter(col("o_orderkey") % 3 =!= 0),
      ord.filter(col("o_orderkey") % 3 === 0),
      li.filter(col("l_linenumber") < 4),
      li.filter(col("l_linenumber") >= 4))
    view.select("o_orderkey", "l_linenumber", "o_custkey",
      "o_orderpriority", "l_extendedprice")
  }

  val queries: Map[String, Q] = Map(
    "q_join_delta_view" -> qJoinDeltaView,
    "q_merge_upsert" -> qMergeUpsert,
    "q_scd2_history" -> qScd2History,
    "q_rollup_incremental" -> qRollupIncremental,
    "q_join_temporal" -> qJoinTemporal)

  val oracleSql: Map[String, String] = Map(
    "q_join_delta_view" ->
      """SELECT o_orderkey, l_linenumber, o_custkey, o_orderpriority,
            l_extendedprice
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",
    "q_rollup_incremental" ->
      """SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS s
         FROM events
         GROUP BY day, event_type ORDER BY day, event_type""",
    "q_merge_upsert" ->
      """WITH base AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice,
                  CAST(1 AS INT) AS version FROM orders),
         delta AS (
           SELECT o_orderkey, 'U' AS o_orderstatus,
                  o_totalprice + 100.0 AS o_totalprice,
                  CAST(2 AS INT) AS version
           FROM orders WHERE o_orderkey % 3 = 0
           UNION ALL
           SELECT o_orderkey + 1000000, 'N', o_totalprice, CAST(2 AS INT)
           FROM orders WHERE o_orderkey % 7 = 0),
         merged AS (
           SELECT * FROM base
           WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
           UNION ALL
           SELECT * FROM delta)
         SELECT o_orderkey, o_orderstatus, o_totalprice, version
         FROM merged ORDER BY o_orderkey""",
    "q_scd2_history" ->
      """SELECT event_id, user_id, value,
           ts AS valid_from,
           LEAD(ts, 1) OVER w AS valid_to,
           (LEAD(ts, 1) OVER w IS NULL) AS is_current
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "q_join_temporal" ->
      """WITH dim AS (
           SELECT user_id, event_id AS state_event_id,
                  value AS state_value,
                  ts AS valid_from,
                  LEAD(ts, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS valid_to
           FROM events WHERE event_type = 'view'),
         probes AS (
           SELECT event_id AS p_event_id, user_id, ts
           FROM events WHERE event_type = 'purchase')
         SELECT p.p_event_id, p.user_id, d.state_event_id, d.state_value
         FROM probes p JOIN dim d USING (user_id)
         WHERE p.ts >= d.valid_from
           AND (d.valid_to IS NULL OR p.ts < d.valid_to)
         ORDER BY p_event_id""")
}
