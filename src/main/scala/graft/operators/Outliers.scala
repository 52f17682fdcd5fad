package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** IQR outlier filtering — the numeric data-cleaning primitive of a
  * training pipeline (drop metric rows outside
  * [q1 − 1.5·IQR, q3 + 1.5·IQR] per group) applied to the scraped-metric
  * shape of the reference's delay series (`dags/warsaw-delays.py:182,186`).
  *
  * Scale shape: the bounds table is one row per group (tiny — exact
  * `percentile` is a single shuffle with partial aggregation), broadcast
  * back onto the fact stream, so the 100 TB side is filtered in place
  * with no second shuffle. Bound arithmetic keeps the exact same
  * double-precision operation order as the oracle (§7.4).
  */
object Outliers {

  /** Per-group [lo, hi] IQR fences over `valueCol`. */
  def iqrBounds(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(percentile(col(valueCol), lit(0.25)).as("q1"),
        percentile(col(valueCol), lit(0.75)).as("q3"))
      .select(col(groupCol),
        (col("q1") - (col("q3") - col("q1")) * lit(1.5)).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * lit(1.5)).as("hi"))

  /** Keep rows inside the per-group fences (NULL values drop). */
  def filterOutliers(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.join(broadcast(iqrBounds(df, groupCol, valueCol)), groupCol)
      .filter(col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: IQR-filter events.value per event_type. */
  val qOutlierIqr: Q = (s, d) =>
    filterOutliers(Tables.events(s, d), "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"))
      .orderBy("event_id")

  val queries: Map[String, Q] = Map("q_outlier_iqr" -> qOutlierIqr)

  val oracleSql: Map[String, String] = Map(
    "q_outlier_iqr" ->
      """WITH b AS (
           SELECT event_type,
                  quantile_cont(value, 0.25) AS q1,
                  quantile_cont(value, 0.75) AS q3
           FROM events GROUP BY event_type),
         f AS (
           SELECT event_type,
                  q1 - (q3 - q1) * 1.5 AS lo,
                  q3 + (q3 - q1) * 1.5 AS hi
           FROM b)
         SELECT e.event_id, e.event_type, e.value
         FROM events e JOIN f USING (event_type)
         WHERE e.value >= f.lo AND e.value <= f.hi
         ORDER BY e.event_id""")
}
