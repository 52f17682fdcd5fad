package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew mitigation for shuffle joins (SURVEY.md "Optimize for scale"):
  * explicit key salting for when AQE's runtime skew-join splitting isn't
  * available (e.g. a skewed aggregation, or a join under a required
  * distribution).
  *
  * `saltedJoin(facts, dim, key, n)` replicates the (small) right side n×
  * and scatters the left side's hot keys across n sub-partitions:
  * left key → (key, salt = pmod(hash(entire row), n)); right → (key, 0..n−1).
  * Equi-join on (key, salt) then behaves as if every key had ≤ |key|/n
  * rows per partition. Correct for inner/left joins on equi keys (each
  * left row matches exactly the one replicated right row with its salt).
  *
  * At 100 TB: AQE `skewJoin` handles sort-merge skew automatically; use
  * this for the cases it can't see — first-stage aggregations
  * ([[saltedCount]]) or joins forced to hash-partition.
  */
object Salting {

  /** Inner/left equi-join with the right side replicated `n` ways. The
    * right side must be the smaller one (it is multiplied n×).
    *
    * Semi/anti are salt-safe too: the right side is replicated for every
    * salt value, so per-(key, salt) existence equals per-key existence.
    * Right/full outer are NOT (each unmatched replicated right row would
    * emit n null-extended copies) — fail fast instead of being wrong. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, n: Int,
      joinType: String = "inner"): DataFrame = {
    require(n > 0)
    // normalize Spark's accepted aliases (leftouter / left_outer / LEFT)
    // the same way JoinType.apply does, then whitelist the salt-safe set
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti").contains(jt),
      s"saltedJoin is only correct for inner/left/semi/anti equi-joins, got $joinType")
    val salted = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(n.toLong))
        .cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: count per (key, salt) → sum per
    * key. The first shuffle spreads any hot key across n reducers. */
  def saltedCount(df: DataFrame, key: Column, n: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(n.toLong)))
    salted.groupBy(key.as("key"), col("_salt"))
      .agg(count(lit(1)).as("partial_n"))
      .groupBy(col("key"))
      .agg(sum(col("partial_n")).as("n"))
  }

  // ---- declared queries -------------------------------------------------
  // The salt values are nondeterministic (partition-dependent), but both
  // operators' RESULTS are salt-independent — so the skew machinery itself
  // sits under the DuckDB oracle gate, checked against the plain unsalted
  // SQL it must be indistinguishable from.

  type Q = (SparkSession, String) => DataFrame

  /** Skew-proof per-flag lineitem counts through [[saltedCount]] (8
    * salts); oracle = the plain GROUP BY it must equal. */
  val qAggSalted: Q = (s, d) =>
    saltedCount(Tables.lineitem(s, d), col("l_returnflag"), n = 8)

  /** Skew-proof fact⟕dim equi-join through [[saltedJoin]] (lineitem ×
    * supplier replicated 8×); oracle = the plain inner join. */
  val qJoinSalted: Q = (s, d) => {
    val facts = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_quantity"))
    val dim = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    saltedJoin(facts, dim, "l_suppkey", n = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        col("l_quantity"), col("s_name"))
      // (l_orderkey, l_linenumber) is not unique in the fixture — order by
      // every column so ties are identical rows (SURVEY.md §7.4)
      .orderBy("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
        "s_name")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_salted" -> qAggSalted,
    "q_join_salted" -> qJoinSalted)

  val oracleSql: Map[String, String] = Map(
    "q_agg_salted" ->
      """SELECT l_returnflag AS key, COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY key""",
    "q_join_salted" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         ORDER BY l_orderkey, l_linenumber, l_suppkey, l_quantity, s_name""")
}
