package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.{ParseDelay, WeightedMean}

/** North-star operators: dedup, text analysis, similarity search, custom
  * UDAF/UDF surfaces (SURVEY.md §2.2; BASELINE.json `north_star`).
  */
object NorthStarQueries {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)
  private val dec6 = DecimalType(18, 6)

  /** Exact dedup keeping the lowest doc_id per text. Deliberately a
    * window + filter, NOT `dropDuplicates` — the surviving row of
    * dropDuplicates is partition-order-dependent and thus nondeterministic
    * (SURVEY.md §2.2). One shuffle on the dedup key; at 100 TB prefer
    * [[qDedupHash]] so the shuffle key is a fixed-width digest. */
  val qDedupExact: Q = (s, d) => {
    val w = Window.partitionBy("text").orderBy("doc_id")
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Dedup by SHA-256 digest of the text — at 100 TB the shuffle key is a
    * 32-byte digest instead of multi-KB documents (reference hash primitive:
    * dags/warsaw-gtfs.py:41-47). */
  val qDedupHash: Q = (s, d) => {
    val w = Window.partitionBy("digest").orderBy("doc_id")
    Tables.documents(s, d)
      .withColumn("digest", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("digest"))
  }

  /** Tokenize → explode → top-20 word counts (tie-broken by word).
    * Reference basis: pagination_text.split() (dags/warsaw-delays.py:91).
    * The groupBy is a two-phase hash agg; top-k is TakeOrdered — no global
    * sort of the token stream. */
  val qTextTokens: Q = (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  /** Per-language corpus stats. avg over BIGINT is exact-sum/exact-count →
    * one IEEE division, deterministic across engines. */
  val qTextStats: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("n_chars")).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))

  /** Positional token explode — the built-in Generator surface
    * (row-index tracking, dags/warsaw-delays.py:106). */
  val qGeneratorPosexplode: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))

  /** Brute-force cosine top-10 against vec_id=0 — the correctness baseline
    * for similarity search (no oracle: float fold order, SURVEY.md §7.4;
    * scalatest-verified against a plain-Scala reference).
    *
    * Plan shape: 1-row broadcast → per-row zip_with/aggregate dot product
    * (no shuffle at all until the final top-k), then TakeOrdered(10). The
    * 100 TB path is the LSH-bucketed variant (graft.operators.Similarity). */
  val qSimilarityTopk: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val dot = aggregate(zip_with(col("embedding"), col("q_emb"),
      (a, b) => a.cast(DoubleType) * b.cast(DoubleType)), lit(0.0), (acc, x) => acc + x)
    val norm = (c: org.apache.spark.sql.Column) =>
      sqrt(aggregate(c, lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    emb.crossJoin(broadcast(q))
      .withColumn("cosine", dot / (norm(col("embedding")) * norm(col("q_emb"))))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Custom UDAF surface: quantity-weighted mean of extendedprice per
    * returnflag, exact decimal buffer (graft.functions.WeightedMean). */
  val qUdafWeighted: Q = (s, d) => {
    val wmean = udaf(WeightedMean, Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble))
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(wmean(col("l_quantity"), col("l_extendedprice"))
        .cast(dec6).cast("double").as("wmean_price"))
  }

  /** Scalar UDF surface: parse "N min|s|h" duration strings → seconds. The
    * raw strings are derived deterministically from event_id so the oracle
    * can reproduce them with arithmetic. */
  val qUdfParseDelay: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        concat(pmod(col("event_id"), lit(120L)).cast(StringType),
          element_at(array(lit(" min"), lit(" s"), lit(" h")),
            (pmod(col("event_id"), lit(3L)) + 1).cast(IntegerType)))
          .as("delay_raw"))
      .withColumn("delay_seconds", ParseDelay.parseDelay(col("delay_raw")))

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_hash" -> qDedupHash,
    "q_text_tokens" -> qTextTokens,
    "q_text_stats" -> qTextStats,
    "q_generator_posexplode" -> qGeneratorPosexplode,
    "q_similarity_topk" -> qSimilarityTopk,
    "q_udaf_weighted" -> qUdafWeighted,
    "q_udf_parse_delay" -> qUdfParseDelay)

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM
         (SELECT doc_id, lang, source, n_chars,
            ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
          FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",
    "q_dedup_hash" ->
      """SELECT doc_id, digest FROM
         (SELECT doc_id, sha256(text) AS digest,
            ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
          FROM documents)
         WHERE rn = 1 ORDER BY doc_id""",
    "q_text_tokens" ->
      """SELECT word, COUNT(*) AS n FROM
         (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
         GROUP BY word ORDER BY n DESC, word ASC LIMIT 20""",
    "q_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, AVG(n_chars) AS avg_chars,
           COUNT(DISTINCT source) AS n_sources
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_generator_posexplode" ->
      """SELECT doc_id, CAST(pos AS INT) AS pos, token FROM
         (SELECT doc_id,
            unnest(generate_series(0, len(toks) - 1)) AS pos,
            unnest(toks) AS token
          FROM (SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents WHERE doc_id < 50))
         ORDER BY doc_id, pos""",
    "q_udaf_weighted" ->
      """SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)))
                / SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,6)) AS DOUBLE) AS wmean_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_udf_parse_delay" ->
      """SELECT event_id,
           CAST(event_id % 120 AS VARCHAR) ||
             (CASE event_id % 3 WHEN 0 THEN ' min' WHEN 1 THEN ' s' ELSE ' h' END)
             AS delay_raw,
           CAST(CASE event_id % 3
             WHEN 0 THEN (event_id % 120) * 60
             WHEN 1 THEN (event_id % 120)
             ELSE (event_id % 120) * 3600 END AS INT) AS delay_seconds
         FROM events ORDER BY event_id""")
}
