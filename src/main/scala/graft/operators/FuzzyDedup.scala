package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy string near-dup via edit distance — the entity-canonicalization
  * primitive (typo'd names, scraped labels). The reference's scraped
  * string columns (`dags/warsaw-delays.py:147-154` keeps raw strings)
  * are the natural consumer.
  *
  * Scale shape: NEVER pair raw rows. Distinct-project the value first —
  * at 100 TB a string key column has a vocabulary orders of magnitude
  * smaller than the row count (the fixture: 2000 rows → 64 names) — then
  * pair the broadcast vocabulary under a length-band prefilter
  * (levenshtein ≤ k ⇒ |len(a) − len(b)| ≤ k, so the band is lossless),
  * and join rows back to a canonical representative. The quadratic factor
  * only ever touches the vocabulary.
  */
object FuzzyDedup {

  /** All distinct-value pairs (a < b) with levenshtein ≤ maxDist, under
    * the lossless length-band prefilter. The band is an EQUI-join, not a
    * theta-join: the left side explodes to its `2·maxDist + 1` candidate
    * lengths (levenshtein ≤ k ⇒ |len(a) − len(b)| ≤ k) and hash-joins the
    * right side's exact length — a hash join, never a nested-loop. No
    * forced broadcast: the vocabulary scales with the corpus, so AQE
    * broadcasts the band table only while it genuinely fits and falls
    * back to a length-keyed shuffle beyond that. */
  def fuzzyPairs(values: DataFrame, valueCol: String,
      maxDist: Int): DataFrame = {
    val v = values.select(col(valueCol)).distinct()
      .select(col(valueCol), length(col(valueCol)).as("_len"))
    val a = v.select(col(valueCol).as("name_a"),
        explode(sequence(col("_len") - maxDist, col("_len") + maxDist))
          .as("_blen"))
    val b = v.select(col(valueCol).as("name_b"), col("_len").as("_blen"))
    // the threshold form early-exits the DP when the running distance
    // exceeds maxDist (banded O(k·n), not O(n²)) and returns -1 past the
    // threshold — the per-pair cost that dominates once the band join
    // scales to a real vocabulary
    a.join(b, Seq("_blen"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: part-name vocabulary pairs within edit distance 2. */
  val qDedupFuzzy: Q = (s, d) =>
    fuzzyPairs(Tables.part(s, d), "p_name", maxDist = 2)

  val queries: Map[String, Q] = Map("q_dedup_fuzzy" -> qDedupFuzzy)

  val oracleSql: Map[String, String] = Map(
    "q_dedup_fuzzy" ->
      """WITH v AS (SELECT DISTINCT p_name FROM part)
         SELECT a.p_name AS name_a, b.p_name AS name_b,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM v a JOIN v b
           ON a.p_name < b.p_name
          AND abs(length(a.p_name) - length(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
         ORDER BY name_a, name_b""")
}
