package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Privacy auditing for training-data release — the k-anonymity /
  * l-diversity census a corpus runs before documents (or user traces)
  * leave the curation pipeline. The reference pipeline lands raw per-user
  * scrape rows (dags/warsaw-delays.py:182-186) with no release gate; a
  * production corpus needs to know which quasi-identifier combinations
  * isolate individuals before anyone trains on them.
  *
  * Model (Sweeney 2002 / Machanavajjhala 2007, public literature):
  * quasi-identifiers (QI) are the attributes an adversary can link on;
  * a QI group is k-anonymous when ≥ k records share it, and l-diverse
  * when its sensitive attribute takes ≥ l distinct values. Groups below
  * either floor must be suppressed or generalized before release.
  *
  * Scale shape: ONE map-side-combinable aggregate over the corpus keyed
  * by the QI tuple — count is a plain partial-sum and the l-diversity
  * distinct runs through Spark's standard partial-distinct expansion, so
  * the shuffle carries (QI, partial) rows, never documents. The audit
  * table is |distinct QI| rows regardless of corpus size. Exact integer
  * output → DuckDB oracle.
  */
object Privacy {

  type Q = (SparkSession, String) => DataFrame

  val KFloor = 5
  val LFloor = 2

  /** k-anonymity / l-diversity audit of `docs` under QI = (lang,
    * length bucket of 200 chars) with `source` as the sensitive
    * attribute: per QI group, k (record count), l (distinct sensitive
    * values), and the release flags. A doc-level generalization of the
    * length column into coarse buckets is itself the standard
    * k-anonymity remedy — the bucket width is the generalization knob. */
  def kAnonymityAudit(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        expr("n_chars div 200").as("len_bucket"),
        col("source"))
      .groupBy("lang", "len_bucket")
      .agg(count(lit(1)).as("k"),
        count_distinct(col("source")).as("l_div"))
      .withColumn("k_anonymous", col("k") >= KFloor)
      .withColumn("l_diverse", col("l_div") >= LFloor)
      .withColumn("releasable", col("k") >= KFloor && col("l_div") >= LFloor)

  val qPrivacyKanon: Q = (s, d) => kAnonymityAudit(Tables.documents(s, d))

  val queries: Map[String, Q] = Map("q_privacy_kanon" -> qPrivacyKanon)

  val oracleSql: Map[String, String] = Map(
    "q_privacy_kanon" ->
      """WITH g AS (
           SELECT lang, n_chars // 200 AS len_bucket, source
           FROM documents)
         SELECT lang, len_bucket,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS l_div,
           COUNT(*) >= 5 AS k_anonymous,
           COUNT(DISTINCT source) >= 2 AS l_diverse,
           (COUNT(*) >= 5 AND COUNT(DISTINCT source) >= 2) AS releasable
         FROM g GROUP BY lang, len_bucket
         ORDER BY lang, len_bucket""")
}
