package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Lake-maintenance planners and trace profiling: compaction binning,
  * corpus coverage curves, partition statistics, and inter-event gap
  * profiles — the operational queries that keep a 100 TB lake healthy
  * (the reference's hourly landing jobs produce exactly the small-file
  * / skewed-partition shapes these plan against,
  * `dags/warsaw-delays.py:194-195`).
  *
  * Scale shape: the planners aggregate first and analyze the aggregate
  * — file bins, partition rows, and coverage ranks are computed over
  * |sources| / |partitions| rows, never raw documents; the only
  * full-corpus passes are source-keyed windows whose grouping reuses
  * the same partitioning. All arithmetic is integer (chars, counts,
  * µs) except final share/rate columns, each one IEEE divide of exact
  * integers (§7.4).
  */
object Maintenance {

  type Q = (SparkSession, String) => DataFrame

  /** Target size for one compacted output file, in document chars. */
  val compactionTarget = 20000L

  /** Compaction plan: documents packed in doc_id order into
    * target-sized bins per source — bin = cumulative-chars-before ÷
    * target, the streaming first-fit rule every table-maintenance
    * compactor uses (a doc lands in the bin its running total reaches;
    * bins overflow by at most one document). Output is the per-bin
    * manifest: doc count, chars, and the contiguous doc_id range to
    * rewrite. One source-keyed window + a groupBy that reuses its
    * partitioning — a single exchange regardless of corpus size, and
    * the manifest is |bins| rows, not |docs|. */
  def compactionPlan(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("before", sum(col("n_chars")).over(w) - col("n_chars"))
      .withColumn("bin", expr(s"before div $compactionTarget"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
  }

  val qCompactionPlan: Q = (s, d) => compactionPlan(Tables.documents(s, d))

  /** Source coverage curve: sources ranked by total chars (ties break
    * by name), with the running char total and its share of the whole
    * corpus — "the top k sources cover X% of the data", the standard
    * mix-audit readout before sampling or quota decisions. The global
    * rank window runs over the already-aggregated |sources| rows (a
    * handful even at 100 TB — sources are a curated set), so the
    * single-partition window is over the aggregate, never the corpus. */
  def coverageCurve(docs: DataFrame): DataFrame = {
    val order = Window.orderBy(col("chars").desc, col("source"))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    docs
      .groupBy("source")
      .agg(sum(col("n_chars")).as("chars"), count(lit(1)).as("n_docs"))
      .withColumn("rank", row_number().over(order))
      .withColumn("cum_chars", sum(col("chars")).over(run))
      .withColumn("share",
        col("cum_chars").cast("double") /
          sum(col("chars")).over(all).cast("double"))
  }

  val qCoverageCurve: Q = (s, d) => coverageCurve(Tables.documents(s, d))

  /** Per-day partition statistics over the event trace: row count,
    * distinct users, and the event_id zonemap (min/max) — the
    * partition-level health table behind pruning decisions and
    * ingest-completeness checks (the file-level variant is
    * [[Layout.zonemap q_layout_zonemap]]; this is the
    * partition-by-value rollup). ONE day-keyed aggregation; the
    * distinct rides Spark's standard Expand rewrite. */
  def partitionStats(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("user_id"), col("event_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))

  val qPartitionStats: Q = (s, d) => partitionStats(Tables.events(s, d))

  /** Per-user inter-event gap profile: number of gaps and the
    * min/max/total/mean gap in exact µs — the cadence feature block
    * behind bot detection and session-threshold tuning (and the
    * data-driven way to pick q_window_session's gap). `lag` pairs each
    * event with its predecessor in one user-keyed window pass; the
    * per-user fold reuses that partitioning, so the whole profile is a
    * single exchange. Mean is one IEEE divide of two exact integers. */
  def gapStats(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        sum(col("gap_us")).as("total_gap_us"))
      .withColumn("mean_gap_us",
        col("total_gap_us").cast("double") / col("n_gaps").cast("double"))
  }

  val qGapStats: Q = (s, d) => gapStats(Tables.events(s, d))

  /** Shuffle-key skew report: per-key load share and hot-key flags for a
    * prospective join/agg key — the diagnostic that decides whether a key
    * needs salting ([[Salting]]) before the real query runs. Per key:
    * row count, exact ppm share (integer div), dense load rank, and
    * `is_hot` = carries >2× the mean per-key load (cnt·nkeys > 2·total —
    * cross-multiplied, no division). One keyed rollup collapses the fact
    * table to |keys| rows; the totals ride full-frame windows over that
    * tiny aggregate, so the 100 TB side is scanned exactly once. */
  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    val order = Window.orderBy(col("cnt").desc, col(keyCol))
    val all = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(all))
      .withColumn("nkeys", count(lit(1)).over(all))
      .select(col(keyCol), col("cnt"),
        expr("cnt * 1000000 div total").as("share_ppm"),
        row_number().over(order).as("load_rank"),
        (col("cnt") * col("nkeys") > col("total") * 2L).as("is_hot"))
  }

  /** Declared query: supplier-key skew report over lineitem. */
  val qSkewReport: Q = (s, d) =>
    skewReport(Tables.lineitem(s, d), "l_suppkey")

  /** Per-source content manifest with an ORDER-INDEPENDENT fingerprint:
    * xor of a 60-bit per-row digest (md5 over id + payload, 15 hex
    * digits so the parse stays inside a signed 64-bit lane in both
    * engines) plus count and id bounds. The audit primitive for "did
    * this re-ingest/restatement land byte-identical content": xor is
    * commutative/associative, so the fingerprint is independent of row
    * order, partitioning, and parallelism — two manifests match iff the
    * multisets of row digests match (mod the 2⁻⁶⁰ xor-collision rate).
    * At 100 TB this is one map-side-combinable `bit_xor` rollup keyed
    * by source; comparing lakes costs |sources| rows. */
  def contentManifest(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("source"), col("doc_id"),
        graft.functions.Md5Draws24.md5Prefix(
          concat(col("doc_id").cast("string"), lit("|"), col("text")), 15)
          .as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        expr("bit_xor(h)").as("fingerprint"))

  val qManifestMerkle: Q = (s, d) => contentManifest(Tables.documents(s, d))

  val queries: Map[String, Q] = Map(
    "q_compaction_plan" -> qCompactionPlan,
    "q_coverage_curve" -> qCoverageCurve,
    "q_partition_stats" -> qPartitionStats,
    "q_gap_stats" -> qGapStats,
    "q_manifest_merkle" -> qManifestMerkle,
    "q_skew_report" -> qSkewReport)

  val oracleSql: Map[String, String] = Map(
    "q_manifest_merkle" ->
      """SELECT source, COUNT(*) AS n_rows,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
           bit_xor(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
             || '|' || text), 1, 15)) AS BIGINT)) AS fingerprint
         FROM documents GROUP BY source ORDER BY source""",
    "q_skew_report" ->
      """WITH k AS (
           SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM lineitem GROUP BY l_suppkey),
         t AS (
           SELECT k.*, SUM(cnt) OVER () AS total,
                  COUNT(*) OVER () AS nkeys
           FROM k)
         SELECT l_suppkey, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey) AS INT)
             AS load_rank,
           cnt * nkeys > total * 2 AS is_hot
         FROM t ORDER BY l_suppkey""",
    "q_compaction_plan" ->
      """WITH c AS (
           SELECT source, doc_id, n_chars,
             CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - n_chars AS before
           FROM documents)
         SELECT source, before // 20000 AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         FROM c GROUP BY source, bin ORDER BY source, bin""",
    "q_coverage_curve" ->
      """WITH s AS (
           SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars,
             CAST(COUNT(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY source)
         SELECT source, chars, n_docs,
           CAST(row_number() OVER (ORDER BY chars DESC, source) AS INT)
             AS rank,
           CAST(SUM(chars) OVER (ORDER BY chars DESC, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_chars,
           CAST(SUM(chars) OVER (ORDER BY chars DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(chars) OVER () AS DOUBLE) AS share
         FROM s ORDER BY rank""",
    "q_partition_stats" ->
      """SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
         FROM events GROUP BY day ORDER BY day""",
    "q_gap_stats" ->
      """WITH g AS (
           SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
               ORDER BY ts, event_id)) AS gap_us
           FROM events),
         f AS (SELECT user_id, gap_us FROM g WHERE gap_us IS NOT NULL)
         SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
           CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_gap_us
         FROM f GROUP BY user_id ORDER BY user_id""")
}
