package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-corpus assembly and ranking-evaluation operators (round 13
  * north-star widening): retrieval-metric evaluation (MRR / hits@k /
  * NDCG) over per-user event rankings, tokenizer fertility accounting,
  * budgeted source mixing, and truncation-tolerant prefix dedup.
  *
  * Reference basis: the reference ranks scraped delay rows per vehicle
  * and keeps per-page "first seen" semantics (`dags/warsaw-delays.py:
  * 116-123` pagination order); these queries are the declarative
  * rank-position algebra a training-data pipeline needs on top of that
  * ordering (which documents to keep, how many tokens each source may
  * contribute, how good a learned ranking is).
  *
  * Exactness: ranks are `row_number` integers; MRR is made EXACT by the
  * lcm device — `2520 = lcm(1..10)` is divisible by every rank in the
  * @10 cutoff, so `sum(2520 div rank)` is an integer both engines agree
  * on, with no 1/3-style repeating floats anywhere. Budget allocation
  * cross-multiplies in decimal(38) before an integral `div`. The one
  * float fold (NDCG's 1/log2 discount) is deliberately no-oracle and
  * deterministic by construction: per-user relevant ranks are collected,
  * sorted, and folded left-to-right with a higher-order `aggregate`, so
  * the double sum has ONE addition order regardless of partitioning.
  *
  * Scale shape: rank windows partition by user (bounded per-key state,
  * one keyed exchange); everything downstream is a map-side-combinable
  * rollup to |buckets| or |lang×source| rows. The mix-budget global
  * window runs over the contracted per-source rollup — bounded by the
  * source catalog, not the corpus. */
object TrainMixOps {

  type Q = (SparkSession, String) => DataFrame

  /** Per-user event ranking: rank = arrival order (ts, event_id tiebreak),
    * "relevant" = purchase events. The shared frame for the MRR and NDCG
    * evaluators. */
  private def rankedEvents(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("event_type") === "purchase").as("rel"))
      .withColumn("rk", row_number().over(w))
  }

  /** Ranking evaluation with EXACT integer MRR@10: per user-decile
    * bucket, `mrr2520 = Σ_users (2520 div first_relevant_rank)` when the
    * first purchase lands in the top 10 (2520 = lcm(1..10), so every
    * per-user reciprocal is exact), plus hits@5 / hits@10 and the total
    * relevant count. Divide mrr2520 by 2520·n_users downstream for the
    * conventional [0,1] reading. */
  val qEvalMrr: Q = (s, d) =>
    rankedEvents(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("rel"), col("rk"))).as("first_rel"),
        sum(when(col("rel") && col("rk") <= 5, 1L).otherwise(0L)).as("h5"),
        sum(when(col("rel") && col("rk") <= 10, 1L).otherwise(0L)).as("h10"),
        sum(when(col("rel"), 1L).otherwise(0L)).as("nrel"))
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("first_rel") <= 10, expr("2520 div first_rel"))
          .otherwise(0L)).as("mrr2520"),
        sum(col("h5")).as("hits_at5"),
        sum(col("h10")).as("hits_at10"),
        sum(col("nrel")).as("n_rel"))

  // DCG position gains at declared MICRO grain: G(r) = round(10⁶ /
  // log2(r+1)) for ranks 1..10, and their prefix sums (the ideal-DCG
  // ladder). Pinning the ten reachable discount values as integer
  // literals — identical in the Spark plan and the DuckDB oracle —
  // removes the float fold entirely (the q_similarity_topk
  // integer-quantization precedent), so NDCG@10 is EXACT-oracle.
  private val DcgGainMicro = Seq(1000000L, 630930L, 500000L, 430677L,
    386853L, 356207L, 333333L, 315465L, 301030L, 289065L)
  private val IdcgMicro = DcgGainMicro.scanLeft(0L)(_ + _).tail

  /** NDCG@10 per user-decile bucket, EXACT at declared micro grain
    * (round 14; formerly a no-oracle float fold): the ten reachable
    * position discounts 1/log2(r+1) are pinned as micro-grain integer
    * literals shared verbatim with the oracle, DCG sums the gains of
    * relevant top-10 ranks, IDCG is the literal prefix-sum ladder at
    * min(nrel, 10), and the per-user score is the integral
    * `(dcg · 10⁶) div idcg` — every value an exact integer in both
    * engines. A perfect ranking scores exactly 10⁶ (dcg = idcg by
    * construction). Property-pinned in TrainMixSpec; users with no
    * relevant events are excluded. */
  val qEvalNdcg: Q = (s, d) =>
    rankedEvents(s, d)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("rel") && col("rk") <= 10,
          element_at(array(DcgGainMicro.map(lit): _*), col("rk")))
          .otherwise(0L)).as("dcg_micro"),
        sum(when(col("rel"), 1L).otherwise(0L)).as("nrel"))
      .filter(col("nrel") > 0)
      .withColumn("ndcg_ppm",
        expr("(dcg_micro * 1000000) div " +
          s"element_at(array(${IdcgMicro.mkString("L,")}L), " +
          "CAST(least(nrel, 10) AS INT))"))
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("ndcg_ppm")).as("sum_ndcg_ppm"))

  /** Tokenizer fertility per language: BPE-ish regex tokens (the
    * [[TextQueries.qTextTokenCount]] classes) and whitespace tokens per
    * character, as exact per-mille/ppm integral divisions of the per-lang
    * sums. The number a tokenizer-budget planner actually consumes —
    * "how many tokens does 1 KB of `lang` text cost". */
  val qTokenizerFertility: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long"))
          .as("n_bpeish"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_ws"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_bpeish"), col("n_ws"),
        col("n_chars"),
        expr("(n_bpeish * 1000) div n_chars").as("bpe_per_kchar"),
        expr("(n_bpeish * 1000000) div n_ws").as("bpe_per_ws_ppm"))

  /** Budgeted source mix: proportional allocation of a 2M-token budget
    * across (lang, source) cells by exact character mass, with a 20%
    * per-cell cap (the standard "no source dominates" rule). The raw
    * share cross-multiplies in decimal(38) before the integral div, so
    * the allocation stays exact at any corpus size (a 100 TB corpus's
    * char mass × 2e6 overflows int64 — the decimal widening is the
    * point, documented here with the sf10 data behind it). The global
    * total is a window over the per-cell rollup — |lang×source| rows,
    * bounded by the catalog, not the corpus. */
  val qMixBudget: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_chars")).as("tok"))
      .withColumn("total",
        sum(col("tok")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("lang"), col("source"), col("tok"),
        expr("""CAST(least(400000,
                (CAST(2000000 AS DECIMAL(38,0)) * tok) div total)
                AS LONG)""").as("alloc"))

  /** Truncation-tolerant exact dedup: documents sharing their first 40
    * characters collapse to the min-doc_id representative (catches
    * re-crawls truncated at different lengths, which full-text
    * [[NorthStarQueries]] exact dedup misses). One prefix-keyed
    * rollup — the shuffle ships 40-char keys, never document bodies. */
  val qDedupPrefix: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(substring(col("text"), 1, 40).as("pfx"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  val queries: Map[String, Q] = Map(
    "q_eval_mrr" -> qEvalMrr,
    "q_eval_ndcg" -> qEvalNdcg,
    "q_tokenizer_fertility" -> qTokenizerFertility,
    "q_mix_budget" -> qMixBudget,
    "q_dedup_prefix" -> qDedupPrefix)

  val oracleSql: Map[String, String] = Map(
    "q_eval_mrr" ->
      """WITH ranked AS (
           SELECT user_id, event_type = 'purchase' AS rel,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
           FROM events),
         per AS (
           SELECT user_id,
             MIN(CASE WHEN rel THEN rk END) AS first_rel,
             SUM(CASE WHEN rel AND rk <= 5 THEN 1 ELSE 0 END) AS h5,
             SUM(CASE WHEN rel AND rk <= 10 THEN 1 ELSE 0 END) AS h10,
             SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS nrel
           FROM ranked GROUP BY user_id)
         SELECT user_id % 10 AS bucket, COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN first_rel <= 10 THEN 2520 // first_rel
                         ELSE 0 END) AS BIGINT) AS mrr2520,
           CAST(SUM(h5) AS BIGINT) AS hits_at5,
           CAST(SUM(h10) AS BIGINT) AS hits_at10,
           CAST(SUM(nrel) AS BIGINT) AS n_rel
         FROM per GROUP BY user_id % 10""",
    "q_eval_ndcg" ->
      """WITH ranked AS (
           SELECT user_id, event_type = 'purchase' AS rel,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rk
           FROM events),
         per AS (
           SELECT user_id,
             SUM(CASE WHEN rel AND rk <= 10 THEN
               ([1000000,630930,500000,430677,386853,
                 356207,333333,315465,301030,289065])[rk]
               ELSE 0 END) AS dcg_micro,
             SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS nrel
           FROM ranked GROUP BY user_id)
         SELECT user_id % 10 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM((dcg_micro * 1000000) //
             ([1000000,1630930,2130930,2561607,2948460,
               3304667,3638000,3953465,4254495,4543560])[
               CAST(LEAST(nrel, 10) AS INT)])
             AS BIGINT) AS sum_ndcg_ppm
         FROM per WHERE nrel > 0 GROUP BY user_id % 10""",
    "q_tokenizer_fertility" ->
      """WITH agg AS (
           SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text,
               '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))) AS BIGINT) AS n_bpeish,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws,
             CAST(SUM(len(text)) AS BIGINT) AS n_chars
           FROM documents GROUP BY lang)
         SELECT lang, n_docs, n_bpeish, n_ws, n_chars,
           CAST((n_bpeish * 1000) // n_chars AS BIGINT) AS bpe_per_kchar,
           CAST((n_bpeish * 1000000) // n_ws AS BIGINT) AS bpe_per_ws_ppm
         FROM agg""",
    "q_mix_budget" ->
      """WITH tok AS (
           SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS tok
           FROM documents GROUP BY lang, source),
         t AS (
           SELECT lang, source, tok,
             SUM(CAST(tok AS HUGEINT)) OVER () AS total
           FROM tok)
         SELECT lang, source, tok,
           CAST(least(400000, (2000000 * CAST(tok AS HUGEINT)) // total)
             AS BIGINT) AS alloc
         FROM t""",
    "q_dedup_prefix" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
         FROM documents GROUP BY substr(text, 1, 40)""")
}
