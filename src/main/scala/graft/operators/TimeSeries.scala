package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series repair: forward-fill (last observation carried forward) of
  * sparse readings per entity — the companion to `q_resample_gapfill`'s
  * dense-grid zero fill. The reference's hourly scrape series
  * (`dags/warsaw-delays.py:182,186`) has exactly this shape: a reading
  * only when the scraper saw one, consumers want the latest-known value
  * on every row.
  *
  * Scale shape: `last(x, ignoreNulls)` over an unbounded-preceding row
  * frame is a single window shuffle on the entity key and a running
  * single-slot state per partition — no self-join, no explode, linear in
  * rows regardless of gap length.
  */
object TimeSeries {

  /** Per-key forward fill of `valueCol` ordered by `tsCol` (+ tiebreak). */
  def fillForward(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCols: Seq[String], valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${valueCol}_filled",
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: derive a deterministic sparse reading (only every
    * 3rd event carries one) and forward-fill it per user over time. */
  val qFillForward: Q = (s, d) =>
    fillForward(
      Tables.events(s, d)
        .withColumn("reading",
          when(col("event_id") % 3 === 0, col("value"))),
      Seq("user_id"), "ts", Seq("event_id"), "reading")
      .select(col("event_id"), col("user_id"), col("reading"),
        col("reading_filled"))
      .orderBy("event_id")

  val queries: Map[String, Q] = Map("q_fill_forward" -> qFillForward)

  val oracleSql: Map[String, String] = Map(
    "q_fill_forward" ->
      """WITH e AS (
           SELECT event_id, user_id, ts,
                  CASE WHEN event_id % 3 = 0 THEN value END AS reading
           FROM events)
         SELECT event_id, user_id, reading,
                last_value(reading IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS reading_filled
         FROM e ORDER BY event_id""")
}
