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

  /** Z-score outlier detection via EXACT integer moments — the
    * mean/stddev companion to the IQR fences. Float sums are
    * order-dependent across partitions, so the moments are accumulated on
    * the centi-unit integers `q = value·100` (events.value is generated at
    * 2 dp, so `DECIMAL(18,2)·100 → BIGINT` is lossless): `n`, `s = Σq`,
    * `ss = Σq²` are associative BIGINT sums, identical under any
    * partitioning and in any engine. The threshold test
    * `(x − mean)² > k²·var` is cleared of divisions by multiplying through
    * by `n²(n−1)`:
    *
    *   (n·q − s)²·(n−1) > k²·n·(n·ss − s²)
    *
    * evaluated in DOUBLE with one rounding per operator on
    * exactly-representable integer inputs — bit-identical in Spark and
    * DuckDB because both sides perform the identical IEEE op sequence.
    *
    * Scale shape: the moment table is one row per group (single shuffle
    * with partial aggregation), broadcast back onto the fact stream —
    * the 100 TB side is flagged map-side with no second shuffle. */
  def zscoreMoments(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    df.select(col(groupCol),
        col(valueCol).cast("decimal(18,2)").multiply(lit(100))
          .cast("long").as("q"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"),
        sum(col("q") * col("q")).as("ss"))

  /** Rows of `df` whose `valueCol` lies more than `k` standard deviations
    * from its group mean (two-sided), by the exact integer-moment test. */
  def zscoreOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double): DataFrame = {
    val fact = df.withColumn("q",
      col(valueCol).cast("decimal(18,2)").multiply(lit(100)).cast("long"))
    val dev = (col("n") * col("q") - col("s")).cast("double")
    val nd = col("n").cast("double")
    val lhs = dev * dev * (col("n") - lit(1L)).cast("double")
    val rhs = lit(k * k) * nd *
      (nd * col("ss").cast("double") -
        col("s").cast("double") * col("s").cast("double"))
    fact.join(broadcast(zscoreMoments(df, groupCol, valueCol)), groupCol)
      .filter(lhs > rhs)
  }

  /** Declared query: events more than 2σ from their event_type mean. */
  val qOutlierZscore: Q = (s, d) =>
    zscoreOutliers(Tables.events(s, d), "event_type", "value", k = 2.0)
      .select(col("event_id"), col("event_type"), col("value"))

  val queries: Map[String, Q] = Map(
    "q_outlier_iqr" -> qOutlierIqr,
    "q_outlier_zscore" -> qOutlierZscore)

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
         ORDER BY e.event_id""",
    "q_outlier_zscore" ->
      """WITH q AS (
           SELECT event_id, event_type, value,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
           FROM events),
         m AS (
           SELECT event_type, COUNT(*) AS n, SUM(q) AS s,
                  SUM(q * q) AS ss
           FROM q GROUP BY event_type)
         SELECT e.event_id, e.event_type, e.value
         FROM q e JOIN m USING (event_type)
         WHERE CAST(e.q * m.n - m.s AS DOUBLE)
                 * CAST(e.q * m.n - m.s AS DOUBLE)
                 * CAST(m.n - 1 AS DOUBLE)
               > 4.0 * CAST(m.n AS DOUBLE)
                 * (CAST(m.n AS DOUBLE) * CAST(m.ss AS DOUBLE)
                    - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE))
         ORDER BY e.event_id""")
}
