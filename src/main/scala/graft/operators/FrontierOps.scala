package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Interval algebra and dominance analytics: merged-interval coverage
  * (the gaps-and-islands classic) and the 2D skyline (Pareto frontier).
  *
  * Reference basis: the reference reports "Outside" flags and delay
  * spans per vehicle row (`dags/warsaw-delays.py:183` column list) and
  * leaves span arithmetic to readers; these are the declarative forms.
  *
  * Exactness: interval endpoints are epoch MICROSECONDS (int64
  * throughout — `unix_micros` ↔ DuckDB `epoch_us`); skyline coordinates
  * are integer cents and counts, and membership is decided by an
  * integer running-max comparison. No floats anywhere.
  *
  * Scale shape: coverage windows partition by user (bounded per-key
  * state, one keyed exchange); the skyline window partitions by market
  * segment over the per-(segment, point) DISTINCT aggregate — at a
  * cardinality where a per-segment sort no longer fits, the standard
  * move is grid-partitioned local skylines + a final merge pass, same
  * algebra. The oracle deliberately uses the O(n²) NOT EXISTS dominance
  * definition — an independent formulation, not a mirror of the
  * running-max trick. */
object FrontierOps {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)

  /** Total covered wall-clock per user when every event opens a 10-min
    * activity interval: overlapping intervals merge into islands (an
    * island starts where `start > max(all previous ends)`), then
    * coverage = Σ island spans. */
  val qIntervalCoverage: Q = (s, d) => {
    val iv = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ivs"))
      .withColumn("ive", col("ivs") + lit(600000000L))
    val w = Window.partitionBy("user_id").orderBy("ivs", "ive")
    val islanded = iv
      .withColumn("prev_max_end",
        max(col("ive")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("ivs") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
    islanded
      .groupBy(col("user_id"), col("island"))
      .agg((max(col("ive")) - min(col("ivs"))).as("span_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("span_us")).as("covered_us"))
  }

  /** Per-segment 2D skyline of customers on (total spend, order count):
    * the Pareto-optimal points no other point in the segment weakly
    * dominates. Points dedupe first (`(spend, n)` with min custkey as
    * representative), then the spend-desc/n-desc sort makes membership a
    * strict `n > running max(n)` test — one window, no self-join. */
  val qSkyline: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast(dec2) * lit(100)).cast("long"))
          .as("spend_c"))
    val pts = spend
      .join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("spend_c"), col("n_orders"))
      .agg(min(col("c_custkey")).as("rep_custkey"),
        count(lit(1)).as("n_dups"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("spend_c").desc, col("n_orders").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("prev_max_n", max(col("n_orders")).over(w))
      .filter(col("prev_max_n").isNull ||
        col("n_orders") > col("prev_max_n"))
      .select(col("c_mktsegment"), col("spend_c"), col("n_orders"),
        col("rep_custkey"), col("n_dups"))
  }

  /** Concentration metrics per market segment — exact Gini and HHI over
    * per-customer spend: Gini from the sorted-rank identity
    * `(2·Σi·x_(i) − (n+1)·Σx) / (n·Σx)` (tie-order-invariant: equal
    * values contribute identically under any rank assignment) and
    * Herfindahl–Hirschman `Σx² / (Σx)²`, both emitted as exact ppm via
    * decimal cross-multiplication — no float shares anywhere.
    *
    * Scale shape: one orders rollup (customer-keyed), one segment join,
    * one per-segment rank window over |customers-per-segment| rows; at a
    * cardinality where that sort hurts, Gini moves to the value
    * HISTOGRAM (same cumulative identity over (value, count) rows — the
    * [[QualityModel.qEvalAuc]] device). */
  val qAggConcentration: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .filter(col("o_custkey").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast(dec2) * lit(100)).cast("long"))
        .as("x"))
    val seg = spend.join(Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("x").asc, col("c_custkey").asc)
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    seg
      .withColumn("i", row_number().over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(dc(col("i")) * dc(col("x"))).as("wsum"),
        sum(dc(col("x")) * dc(col("x"))).as("x2"))
      .select(col("c_mktsegment"), col("n"),
        expr("""CAST(((2 * wsum - (CAST(n AS DECIMAL(19,0)) + 1) * sx)
                * 1000000)
                div (CAST(n AS DECIMAL(19,0)) * sx) AS LONG)""")
          .as("gini_ppm"),
        expr("""CAST((x2 * 1000000)
                div (CAST(sx AS DECIMAL(19,0)) * sx) AS LONG)""")
          .as("hhi_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_interval_coverage" -> qIntervalCoverage,
    "q_skyline" -> qSkyline,
    "q_agg_concentration" -> qAggConcentration)

  val oracleSql: Map[String, String] = Map(
    "q_agg_concentration" ->
      """WITH spend AS (
           SELECT o_custkey,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS x
           FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
         seg AS (
           SELECT c.c_mktsegment, s.x,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY s.x ASC, c.c_custkey ASC) AS i
           FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey)
         SELECT c_mktsegment, COUNT(*) AS n,
           CAST(((2 * CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT)
                 - (COUNT(*) + 1) * CAST(SUM(x) AS HUGEINT)) * 1000000)
             // (COUNT(*) * CAST(SUM(x) AS HUGEINT)) AS BIGINT)
             AS gini_ppm,
           CAST((CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) * 1000000)
             // (CAST(SUM(x) AS HUGEINT) * CAST(SUM(x) AS HUGEINT))
             AS BIGINT) AS hhi_ppm
         FROM seg GROUP BY c_mktsegment""",
    "q_interval_coverage" ->
      """WITH iv AS (
           SELECT user_id, epoch_us(ts) AS ivs,
             epoch_us(ts) + 600000000 AS ive
           FROM events),
         m AS (
           SELECT user_id, ivs, ive,
             MAX(ive) OVER (PARTITION BY user_id ORDER BY ivs, ive
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_end
           FROM iv),
         isl AS (
           SELECT user_id, ivs, ive,
             SUM(CASE WHEN prev_max_end IS NULL OR ivs > prev_max_end
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ivs, ive
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
           FROM m),
         g AS (
           SELECT user_id, island, MAX(ive) - MIN(ivs) AS span_us
           FROM isl GROUP BY user_id, island)
         SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(span_us) AS BIGINT) AS covered_us
         FROM g GROUP BY user_id""",
    "q_skyline" ->
      """WITH spend AS (
           SELECT o_custkey,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
               AS BIGINT)) AS BIGINT) AS spend_c
           FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey),
         pts AS (
           SELECT c.c_mktsegment, s.spend_c, s.n_orders,
             MIN(c.c_custkey) AS rep_custkey, COUNT(*) AS n_dups
           FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
           GROUP BY 1, 2, 3)
         SELECT p.c_mktsegment, p.spend_c, p.n_orders, p.rep_custkey,
           p.n_dups
         FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.c_mktsegment = p.c_mktsegment
             AND q.spend_c >= p.spend_c AND q.n_orders >= p.n_orders
             AND (q.spend_c > p.spend_c OR q.n_orders > p.n_orders))""")
}
