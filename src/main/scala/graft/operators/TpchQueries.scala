package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Classic decision-support join pipelines — the TPC-H Q3/Q5/Q10 shapes
  * over the fixture's TPC-H-ish tables. These are the multi-way
  * join-planning workloads the rest of the registry exercises only
  * piecewise: star joins over one fact (lineitem) with dimension chains
  * of 2–5 tables, selective predicates on both fact and dimensions, and
  * a grouped decimal-exact revenue rollup with top-k output.
  *
  * Planning story at 100 TB: nation (25 rows) and region (5 rows) are
  * BROADCAST by hint — they are constants of the schema. supplier /
  * customer / orders are NOT hinted: at fixture scale AQE broadcasts
  * them on its own, at warehouse scale they are fact-sized and must
  * shuffle on their keys — hard-coding a broadcast there is exactly the
  * anti-pattern that melts drivers, so the plan leaves the choice to
  * stats + AQE. Predicates sit directly on base scans, so Catalyst
  * pushes them into the parquet scan (date/segment/flag filters prune
  * row groups before any join). Revenue folds in DECIMAL(18,2) factors
  * (§7.4 — float sums are partitioning-dependent; decimals are exact
  * and engine-identical), surfaced as DOUBLE only at the output boundary.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)

  /** Σ extendedprice·(1−discount), exact: both factors cast to
    * DECIMAL(18,2) BEFORE the multiply, so every partial is exact and
    * the fold is associative — the oracle mirrors the same casts. */
  private def revenue: Column =
    sum(col("l_extendedprice").cast(dec2) *
      (lit(1).cast(dec2) - col("l_discount").cast(dec2)))
      .cast(DecimalType(18, 4)).cast("double")

  /** Q3 shape — shipping-priority candidates: revenue of BUILDING-
    * segment orders placed before the cutoff with lineitems shipped
    * after it, top 10 by revenue. Join order: the selective customer
    * filter reduces orders first, lineitem joins last on the fact key.
    * (The fixture carries o_orderpriority, not Q3's o_shippriority —
    * same shape.) */
  val qTpchQ3: Q = (s, d) => {
    val cut = to_timestamp(lit("1998-07-01"))
    val cust = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc,
        col("l_orderkey").asc)
      .limit(10)
  }

  /** Q5 shape — local-supplier volume: revenue per nation for EUROPE
    * orders in 1996 where the supplier and the customer share a nation
    * (the classic 6-table chain with the c_nationkey = s_nationkey
    * locality predicate). nation/region broadcast by hint. */
  val qTpchQ5: Q = (s, d) => {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .select("o_orderkey", "o_custkey")
    val dim = broadcast(Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "EUROPE").select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name"))
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(dim, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(revenue.as("revenue"))
  }

  /** Q10 shape — returned-item reporting: top 20 customers by revenue
    * lost to returns (l_returnflag = 'R') on Q1-1996 orders, with their
    * nation. Customer joins AFTER the fact-side rollup would be the
    * textbook optimization; here the join tree mirrors Q10 and Catalyst
    * prunes columns so only keys and the two price columns move. */
  val qTpchQ10: Q = (s, d) => {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1996-04-01")))
      .select("o_orderkey", "o_custkey")
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(revenue.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  val queries: Map[String, Q] = Map(
    "q_tpch_q3" -> qTpchQ3,
    "q_tpch_q5" -> qTpchQ5,
    "q_tpch_q10" -> qTpchQ10)

  private val revSql =
    """CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
         AS DECIMAL(18,4)) AS DOUBLE)"""

  val oracleSql: Map[String, String] = Map(
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
            $revSql AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-07-01'
            AND l_shipdate > TIMESTAMP '1998-07-01'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
          LIMIT 10""",
    "q_tpch_q5" ->
      s"""SELECT n_name, $revSql AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN customer ON o_custkey = c_custkey
            AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY n_name
          ORDER BY n_name""",
    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revSql AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1996-04-01'
          GROUP BY c_custkey, c_name, c_acctbal, n_name
          ORDER BY revenue DESC, c_custkey ASC
          LIMIT 20""")
}
