package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Generator / iterative-SQL surface: recursive CTEs (Spark 4's
  * `UnionLoop`), inline `VALUES` relations, and per-row series
  * generation (`explode(sequence(...))`).
  *
  * Reference basis: the reference walks paginated state imperatively
  * (`dags/warsaw-delays.py:169-177` — a driver-side loop advancing
  * `current_page` until a stop condition); a recursive CTE is the
  * declarative form of exactly that fixed-point iteration, executed by
  * the engine instead of the driver.
  *
  * Scale notes: the recursive step joins the (tiny) frontier to a
  * window-derived parent table — each `UnionLoop` iteration is one
  * broadcast-joinable step, and depth is bounded by the longest chain,
  * not the table size. The `VALUES` relation is a literal 5-row plan
  * (`LocalRelation`) that Catalyst folds into a broadcast build side.
  * `sequence()` fans out BEFORE partial aggregation, so the rollup
  * combines map-side and the shuffle carries only (day, count) pairs.
  */
object GeneratorOps {

  type Q = (SparkSession, String) => DataFrame

  /** Chain walk via WITH RECURSIVE: within each region, nations form a
    * predecessor chain (parent = next-lower key, derived by `lag`);
    * the recursion carries each nation's chain root and depth. This is
    * the org-hierarchy / BOM traversal shape warehouse users write —
    * executed by Spark's UnionLoop operator, no driver-side loop. */
  val qRecursiveCte: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("rc_nation")
    s.sql(
      """WITH RECURSIVE par AS (
           SELECT n_nationkey, n_regionkey,
             lag(n_nationkey) OVER (PARTITION BY n_regionkey
                                    ORDER BY n_nationkey) AS parent
           FROM rc_nation),
         chain AS (
           SELECT n_nationkey, n_regionkey, n_nationkey AS root_key,
             1 AS depth
           FROM par WHERE parent IS NULL
           UNION ALL
           SELECT p.n_nationkey, p.n_regionkey, c.root_key, c.depth + 1
           FROM par p JOIN chain c ON p.parent = c.n_nationkey)
         SELECT n_nationkey, n_regionkey, root_key, depth FROM chain""")
  }

  /** Inline VALUES dim: a literal priority→tier mapping joined onto
    * orders — the curated-vocabulary join (no lookup table on disk, no
    * collect; the 5-row LocalRelation broadcasts). */
  val qValuesInline: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("vi_orders")
    s.sql(
      """SELECT t.tier, COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
         FROM vi_orders o
         JOIN (VALUES ('1-URGENT', 'rush'), ('2-HIGH', 'rush'),
                      ('3-MEDIUM', 'std'), ('4-NOT SPECIFIED', 'std'),
                      ('5-LOW', 'lazy')) AS t(pri, tier)
           ON o.o_orderpriority = t.pri
         GROUP BY t.tier""")
  }

  /** Per-row date-series generation: every order stays "open" for 4
    * calendar days; count open orders per day. `explode(sequence(...))`
    * is the engine-side table function — the generated rows never leave
    * the executor before the partial count. */
  val qGeneratorSequence: Q = (s, d) =>
    Tables.orders(s, d)
      .select(explode(sequence(to_date(col("o_orderdate")),
        date_add(to_date(col("o_orderdate")), 3))).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_open"))

  val queries: Map[String, Q] = Map(
    "q_recursive_cte" -> qRecursiveCte,
    "q_values_inline" -> qValuesInline,
    "q_generator_sequence" -> qGeneratorSequence)

  val oracleSql: Map[String, String] = Map(
    "q_recursive_cte" ->
      """WITH RECURSIVE par AS (
           SELECT n_nationkey, n_regionkey,
             lag(n_nationkey) OVER (PARTITION BY n_regionkey
                                    ORDER BY n_nationkey) AS parent
           FROM nation),
         chain AS (
           SELECT n_nationkey, n_regionkey, n_nationkey AS root_key,
             1 AS depth
           FROM par WHERE parent IS NULL
           UNION ALL
           SELECT p.n_nationkey, p.n_regionkey, c.root_key, c.depth + 1
           FROM par p JOIN chain c ON p.parent = c.n_nationkey)
         SELECT n_nationkey, n_regionkey, root_key, depth FROM chain""",
    "q_values_inline" ->
      """SELECT t.tier, COUNT(*) AS n,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
         FROM orders o
         JOIN (VALUES ('1-URGENT', 'rush'), ('2-HIGH', 'rush'),
                      ('3-MEDIUM', 'std'), ('4-NOT SPECIFIED', 'std'),
                      ('5-LOW', 'lazy')) AS t(pri, tier)
           ON o.o_orderpriority = t.pri
         GROUP BY t.tier""",
    "q_generator_sequence" ->
      """SELECT day, COUNT(*) AS n_open
         FROM (SELECT CAST(unnest(generate_series(
                 CAST(o_orderdate AS DATE),
                 CAST(o_orderdate AS DATE) + INTERVAL 3 DAY,
                 INTERVAL 1 DAY)) AS DATE) AS day
               FROM orders)
         GROUP BY day""")
}
