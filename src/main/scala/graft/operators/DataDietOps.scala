package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus "data diet" operators (round 13): the accounting and weighting
  * queries a training-data curator runs between raw crawl and tokenizer —
  * normalization-keyed dedup, soft-dedup weighting (keep duplicates,
  * down-weight them), the sequential filter-funnel survival report,
  * epoch-bounded budget scheduling for data-constrained training, and
  * fixed-threshold curriculum bucketing.
  *
  * Reference basis: the reference deduplicates scraped delay pages by
  * "seen set" membership per pagination pass (`dags/warsaw-delays.py:
  * 116-123`) and gates ingest on a feed digest (`dags/warsaw-gtfs.py:
  * 41-47`); these queries are the corpus-scale generalization — what to
  * keep, at what weight, in which order, within which token budget.
  *
  * Exactness: every ratio rule is cross-multiplied to integer predicates
  * (house rule, SURVEY §7.4); every division is an integral `div`; dedup
  * keys are md5 hex digests both engines spell identically. No floats
  * anywhere, so all five queries carry exact DuckDB oracles.
  *
  * Scale shape: the funnel and curriculum queries are single-pass
  * map-side-combinable rollups (zero or one exchange, no per-key sorts —
  * deliberate contrast with q_quality_terciles' ntile, which needs a
  * per-lang sort). The dedup queries shuffle 32-byte digests plus ids,
  * never document bodies. The budget scheduler's global window runs over
  * the |sources|-row rollup (contracted-rollup precedent, q_tpch_q11).
  */
object DataDietOps {

  type Q = (SparkSession, String) => DataFrame

  /** Canonical text normalization shared by the norm-dedup query: case
    * fold, collapse every non-alphanumeric run to one space, trim. The
    * standard "aggressive normalization" step before exact dedup (it
    * catches re-crawls differing only in punctuation/whitespace/case,
    * which byte-exact dedup misses). */
  private def normKey = md5(trim(regexp_replace(lower(col("text")),
    lit("[^a-z0-9]+"), lit(" "))))

  /** Normalization-keyed exact dedup: documents equal after case-fold +
    * punctuation collapse share a group; keep the min-doc_id
    * representative. The shuffle ships 32-char md5 digests, never
    * bodies — constant key width at any document length. */
  val qDedupNorm: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(normKey.as("k"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** Soft dedup (down-weight, don't drop): each document keeps weight
    * 1e6 div |its exact-duplicate group| ppm, so a trainer sees every
    * byte once in expectation without discarding provenance diversity.
    * One digest-keyed exchange; the count rides a window over the key so
    * no self-join materializes. */
  val qDedupSoft: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), md5(col("text")).as("k"))
      .withColumn("n_dups", count(lit(1)).over(Window.partitionBy("k")))
      .select(col("doc_id"), col("n_dups"),
        expr("1000000 div n_dups").as("weight_ppm"))

  /** Sequential filter-funnel survival report: how many documents
    * survive each cumulative stage of a 5-rule quality cascade —
    * the "where did my data go" table every curation run publishes.
    * Stages (each ANDed onto the previous):
    *   1. ≥200 chars;  2. ≥30 whitespace words;
    *   3. alphabetic chars ≥55% of text (100·alpha ≥ 55·chars);
    *   4. digit chars ≤20% of text (100·digit ≤ 20·chars);
    *   5. mean word length in [3,12] chars (3·words ≤ chars ≤ 12·words).
    * Unlike [[TextQueries.gopherGate]] (independent per-doc flags), the
    * output is the ORDERED funnel: stage 0 = corpus size, stage k = docs
    * passing rules 1..k. Single pass, six conditional sums, one
    * map-side-combinable aggregate → `stack` to rows. */
  val qFilterCascade: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), lit("[^A-Za-z]"), lit("")))
          .cast("long").as("n_alpha"),
        length(regexp_replace(col("text"), lit("[^0-9]"), lit("")))
          .cast("long").as("n_digit"))
    val c1 = col("n_chars") >= 200L
    val c2 = c1 && col("n_words") >= 30L
    val c3 = c2 && lit(100L) * col("n_alpha") >= lit(55L) * col("n_chars")
    val c4 = c3 && lit(100L) * col("n_digit") <= lit(20L) * col("n_chars")
    val c5 = c4 && lit(3L) * col("n_words") <= col("n_chars") &&
      col("n_chars") <= lit(12L) * col("n_words")
    docs.agg(
        count(lit(1)).as("n0"),
        sum(when(c1, 1L).otherwise(0L)).as("n1"),
        sum(when(c2, 1L).otherwise(0L)).as("n2"),
        sum(when(c3, 1L).otherwise(0L)).as("n3"),
        sum(when(c4, 1L).otherwise(0L)).as("n4"),
        sum(when(c5, 1L).otherwise(0L)).as("n5"))
      .selectExpr("""stack(6, 0, n0, 1, n1, 2, n2, 3, n3, 4, n4, 5, n5)
        AS (stage, n_survivors)""")
  }

  /** Epoch-bounded budget schedule for data-constrained training
    * (Muennighoff et al. 2023, public result: repeating data up to ~4
    * epochs is near-free): a 10M-char budget is split EQUALLY across
    * sources (uniform target mixture), each source repeats
    * ceil(share/tok) epochs capped at 4, and the report shows what each
    * source actually contributes and the unfillable deficit. All
    * integral: share = B div n_sources, epochs = (share+tok-1) div tok
    * capped, consumed = least(share, 4·tok). The window runs over the
    * |sources|-row rollup, bounded by the catalog, not the corpus. */
  val qEpochSchedule: Q = (s, d) => {
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("tok"))
      .withColumn("n_sources", count(lit(1)).over(wAll))
      .withColumn("share", expr("10000000 div n_sources"))
      .select(col("source"), col("tok"), col("share"),
        least(lit(4L), expr("(share + tok - 1) div tok")).as("epochs"),
        least(col("share"), lit(4L) * col("tok")).as("consumed"),
        greatest(lit(0L), col("share") - lit(4L) * col("tok"))
          .as("deficit"))
  }

  /** Fixed-threshold curriculum bucketing: difficulty = mean word length
    * in per-mille chars (1000·chars div words — longer words ≈ harder
    * text), phase 1/2/3 by pinned literal thresholds. Emits per
    * (phase, lang) doc and char mass plus id bounds. Because the
    * thresholds are literals (not quantiles), the whole query is ONE
    * map-side-combinable aggregate with no per-key sort — the
    * scale-robust counterpart to q_quality_terciles' ntile(3), which
    * must sort every language partition. */
  val qCurriculumBuckets: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_words"))
      .withColumn("difficulty", expr("(1000 * n_chars) div n_words"))
      .withColumn("phase",
        when(col("difficulty") < 4500L, 1)
          .when(col("difficulty") < 5500L, 2)
          .otherwise(3))
      .groupBy(col("phase"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("char_mass"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  val queries: Map[String, Q] = Map(
    "q_dedup_norm" -> qDedupNorm,
    "q_dedup_soft" -> qDedupSoft,
    "q_filter_cascade" -> qFilterCascade,
    "q_epoch_schedule" -> qEpochSchedule,
    "q_curriculum_buckets" -> qCurriculumBuckets)

  val oracleSql: Map[String, String] = Map(
    "q_dedup_norm" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         FROM documents
         GROUP BY md5(trim(regexp_replace(lower(text),
                                          '[^a-z0-9]+', ' ', 'g')))""",
    "q_dedup_soft" ->
      """SELECT doc_id,
           COUNT(*) OVER (PARTITION BY md5(text)) AS n_dups,
           1000000 // (COUNT(*) OVER (PARTITION BY md5(text)))
             AS weight_ppm
         FROM documents""",
    "q_filter_cascade" ->
      """WITH per AS (
           SELECT n_chars,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
           FROM documents),
         f AS (
           SELECT n_chars >= 200 AS c1,
             n_chars >= 200 AND n_words >= 30 AS c2,
             n_chars >= 200 AND n_words >= 30
               AND 100*n_alpha >= 55*n_chars AS c3,
             n_chars >= 200 AND n_words >= 30
               AND 100*n_alpha >= 55*n_chars
               AND 100*n_digit <= 20*n_chars AS c4,
             n_chars >= 200 AND n_words >= 30
               AND 100*n_alpha >= 55*n_chars
               AND 100*n_digit <= 20*n_chars
               AND 3*n_words <= n_chars AND n_chars <= 12*n_words AS c5
           FROM per),
         agg AS (
           SELECT COUNT(*) AS n0,
             SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS n2,
             SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS n3,
             SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS n4,
             SUM(CASE WHEN c5 THEN 1 ELSE 0 END) AS n5
           FROM f)
         SELECT 0 AS stage, CAST(n0 AS BIGINT) AS n_survivors FROM agg
         UNION ALL SELECT 1, CAST(n1 AS BIGINT) FROM agg
         UNION ALL SELECT 2, CAST(n2 AS BIGINT) FROM agg
         UNION ALL SELECT 3, CAST(n3 AS BIGINT) FROM agg
         UNION ALL SELECT 4, CAST(n4 AS BIGINT) FROM agg
         UNION ALL SELECT 5, CAST(n5 AS BIGINT) FROM agg""",
    "q_epoch_schedule" ->
      """WITH t AS (
           SELECT source, CAST(SUM(n_chars) AS BIGINT) AS tok,
             COUNT(*) OVER () AS n_sources
           FROM documents GROUP BY source),
         s AS (
           SELECT source, tok, 10000000 // n_sources AS share FROM t)
         SELECT source, tok, CAST(share AS BIGINT) AS share,
           CAST(least(4, (share + tok - 1) // tok) AS BIGINT) AS epochs,
           CAST(least(share, 4 * tok) AS BIGINT) AS consumed,
           CAST(greatest(0, share - 4 * tok) AS BIGINT) AS deficit
         FROM s""",
    "q_curriculum_buckets" ->
      """WITH per AS (
           SELECT doc_id, lang, n_chars,
             (1000 * n_chars) // len(string_split(text, ' '))
               AS difficulty
           FROM documents)
         SELECT CASE WHEN difficulty < 4500 THEN 1
                     WHEN difficulty < 5500 THEN 2 ELSE 3 END AS phase,
           lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS char_mass,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         FROM per GROUP BY 1, 2""")
}
