package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Record linkage / entity resolution over the customer master — the
  * dedup problem for ENTITIES rather than documents (the reference's
  * feed-hash dedup, `dags/warsaw-gtfs.py:60-71`, is the file-level
  * degenerate case). Classic pipeline (Fellegi–Sunter / sorted
  * neighborhood, public literature): block candidate pairs cheaply,
  * score the survivors with an edit-distance comparator, link above
  * threshold.
  *
  * Scale shape: sorted-neighborhood blocking — one window pass per
  * blocking key (nation) over the name-sorted order, each record paired
  * with its next `width` neighbors via `lead` — generates O(N·width)
  * candidates, never the O(N²/blocks) of naive within-block pairing, and
  * the scoring (`levenshtein`) runs map-side on the candidate stream.
  * One keyed exchange total; integer edit distances → exact oracle.
  */
object Linkage {

  type Q = (SparkSession, String) => DataFrame

  /** Candidate pairs from `width` sorted neighbors per record within each
    * blocking partition, scored by levenshtein and kept at ≤ `maxDist`.
    * Ordering ties break on the record key, so candidates (and therefore
    * the linked-pair set) are total-order deterministic. */
  def sortedNeighborhoodLinks(records: DataFrame, blockCol: String,
      nameCol: String, keyCol: String, width: Int, maxDist: Int): DataFrame = {
    val w = Window.partitionBy(blockCol).orderBy(nameCol, keyCol)
    records
      .select(col(keyCol).as("a_key"), col(nameCol).as("a_name"),
        col(blockCol),
        array((1 to width).map(i => struct(
          lead(col(keyCol), i).over(w).as("b_key"),
          lead(col(nameCol), i).over(w).as("b_name"))): _*).as("cands"))
      .select(col("a_key"), col("a_name"), explode(col("cands")).as("b"))
      .filter(col("b.b_key").isNotNull)
      .select(col("a_key"), col("b.b_key").as("b_key"), col("a_name"),
        col("b.b_name").as("b_name"),
        levenshtein(col("a_name"), col("b.b_name")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Declared query: nation-blocked, 3-wide sorted-neighborhood customer
    * links at edit distance ≤ 2. */
  val qLinkEntities: Q = (s, d) =>
    sortedNeighborhoodLinks(Tables.customer(s, d), "c_nationkey", "c_name",
      "c_custkey", width = 3, maxDist = 2)
      .withColumnsRenamed(Map("a_key" -> "a_custkey", "b_key" -> "b_custkey"))

  val queries: Map[String, Q] = Map("q_link_entities" -> qLinkEntities)

  val oracleSql: Map[String, String] = Map(
    "q_link_entities" ->
      """WITH l AS (
           SELECT c_custkey AS a_custkey, c_name AS a_name,
             lead(c_custkey, 1) OVER w AS b_custkey,
             lead(c_name, 1) OVER w AS b_name
           FROM customer
           WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_name, c_custkey)
           UNION ALL
           SELECT c_custkey, c_name,
             lead(c_custkey, 2) OVER w2, lead(c_name, 2) OVER w2
           FROM customer
           WINDOW w2 AS (PARTITION BY c_nationkey ORDER BY c_name, c_custkey)
           UNION ALL
           SELECT c_custkey, c_name,
             lead(c_custkey, 3) OVER w3, lead(c_name, 3) OVER w3
           FROM customer
           WINDOW w3 AS (PARTITION BY c_nationkey ORDER BY c_name, c_custkey))
         SELECT a_custkey, b_custkey, a_name, b_name,
           CAST(levenshtein(a_name, b_name) AS INT) AS dist
         FROM l
         WHERE b_custkey IS NOT NULL
           AND levenshtein(a_name, b_name) <= 2
         ORDER BY a_custkey, b_custkey""")
}
