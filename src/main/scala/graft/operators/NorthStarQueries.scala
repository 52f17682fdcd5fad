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

  /** LIBRARY TIER — brute-force float-cosine top-k against a 1-row query
    * frame: 1-row broadcast → per-row zip_with/aggregate dot product (no
    * shuffle until the final top-k), then TakeOrdered(k). Kept as the
    * float-precision API (NoOracleSpec verifies it against plain Scala
    * through the LSH/IVF recall tests); the DECLARED query below ranks in
    * exact integers instead so it can sit under the DuckDB oracle gate. */
  def cosineTopK(emb: DataFrame, query: DataFrame, k: Int): DataFrame = {
    val dot = aggregate(zip_with(col("embedding"), col("q_emb"),
      (a, b) => a.cast(DoubleType) * b.cast(DoubleType)), lit(0.0), (acc, x) => acc + x)
    val norm = (c: org.apache.spark.sql.Column) =>
      sqrt(aggregate(c, lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    emb.crossJoin(broadcast(query.select(col("embedding").as("q_emb"))))
      .withColumn("cosine", dot / (norm(col("embedding")) * norm(col("q_emb"))))
      .select(col("vec_id"), col("label"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Brute-force similarity top-10 against vec_id=0 with an EXACT oracle
    * (round-9 move out of the no-oracle class, the q_dedup_embed_q
    * precedent): milli-quantize (round(CAST(x AS DOUBLE)·1000) — the
    * double cast is LOAD-BEARING: DuckDB multiplies FLOAT·INT in float,
    * Spark promotes to double, and a float32 payload like 0.3195f lands
    * on 319.5 in one engine and 319.4999… in the other; round 10 pinned
    * both engines to the double product), int64 dot/norms, and rank by
    * the integer score
    *   sign(dot) · (dot²·10¹² div (‖a‖²·‖q‖²))
    * — a pure-integer monotone image of cosine² with the sign restored,
    * computed in DECIMAL(38,0)/HUGEINT so nothing wraps, truncating
    * division only on a non-negative quotient (no trunc-vs-floor
    * divergence), vec_id tiebreak. No float crosses the engine boundary.
    *
    * Plan shape: 1-row broadcast (the query vector), map-side quantize +
    * native codegen'd integer dot (LongVecDot), TakeOrdered(10) — no
    * shuffle before the top-k. The 100 TB path is the LSH/IVF-bucketed
    * variant (graft.operators.Similarity); this is the exactness
    * baseline. */
  /** Shared quantized corpus for the exact-integer similarity pair
    * ([[qSimilarityTopk]] / [[qSimilarityRange]]): one definition of the
    * (vec_id, label, code vector, squared norm) frame so the two halves
    * of the ANN API can never quantize differently. */
  private def quantCorpus(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.dotL
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.milliQuant(col("embedding")).as("qv"))
      .withColumn("n2", dotL(col("qv"), col("qv")))
  }

  val qSimilarityTopk: Q = (s, d) => {
    import graft.functions.VectorFunctions.dotL
    val e = quantCorpus(s, d)
    val q = e.filter(col("vec_id") === 0)
      .select(col("qv").as("q_qv"), col("n2").as("q_n2"))
    e.filter(col("vec_id") =!= 0 && col("n2") > 0)
      .crossJoin(broadcast(q))
      .withColumn("dot", dotL(col("qv"), col("q_qv")))
      .withColumn("score", expr(
        """(CASE WHEN dot < 0 THEN -1L ELSE 1L END) *
           ((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000)
            div (CAST(n2 AS DECIMAL(38,0)) * q_n2))"""))
      .select(col("vec_id"), col("label"), col("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
  }

  /** Batch range (threshold) similarity — the other half of the ANN API
    * next to [[qSimilarityTopk]]: every corpus vector within cosine ≥ 0.2
    * of any of the first 8 probe vectors, under the SAME integer score
    * algebra (milli-quantized int64 dot/norms; the threshold test is the
    * cross-multiplied `dot²·100 ≥ 4·‖a‖²·‖q‖²` with `dot > 0`, so no
    * division at all decides membership). `vec_id > probe_id` keeps each
    * pair once.
    *
    * Plan shape: the 8-row probe table broadcasts into a nested-loop
    * join (the `>` pairing predicate), the dot/threshold run map-side
    * via the codegen'd LongVecDot — no shuffle anywhere. At 100 TB the
    * probe batch stays a broadcast and the corpus scan partitions
    * freely; the LSH/IVF variants (graft.operators.Similarity) are the
    * recall-traded scale path. */
  val qSimilarityRange: Q = (s, d) => {
    import graft.functions.VectorFunctions.dotL
    val e = quantCorpus(s, d)
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("probe_id"), col("qv").as("q_qv"),
        col("n2").as("q_n2"))
    e.filter(col("n2") > 0)
      .join(broadcast(q), col("vec_id") > col("probe_id"))
      .withColumn("dot", dotL(col("qv"), col("q_qv")))
      .filter(col("dot") > 0 && expr(
        "CAST(dot AS DECIMAL(38,0)) * dot * 100 >= " +
          "4 * (CAST(n2 AS DECIMAL(38,0)) * q_n2)"))
      .select(col("probe_id"), col("vec_id"), col("label"),
        expr("""CAST((CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000)
                div (CAST(n2 AS DECIMAL(38,0)) * q_n2) AS LONG)""")
          .as("score"))
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
    "q_similarity_range" -> qSimilarityRange,
    "q_udaf_weighted" -> qUdafWeighted,
    "q_udf_parse_delay" -> qUdfParseDelay)

  val oracleSql: Map[String, String] = Map(
    "q_similarity_range" ->
      """WITH e AS (
           SELECT vec_id, label,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS qv
           FROM embeddings),
         n AS (
           SELECT vec_id, label, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
           FROM e),
         q AS (SELECT vec_id AS probe_id, qv AS q_qv, n2 AS q_n2
               FROM n WHERE vec_id < 8),
         sc AS (
           SELECT q.probe_id, n.vec_id, n.label,
             CAST(list_sum(list_transform(list_zip(n.qv, q.q_qv),
               t -> t[1] * t[2])) AS BIGINT) AS dot,
             n.n2, q.q_n2
           FROM n, q WHERE n.vec_id > q.probe_id AND n.n2 > 0)
         SELECT probe_id, vec_id, label,
           CAST((CAST(dot AS HUGEINT) * dot * 1000000000000) //
             (CAST(n2 AS HUGEINT) * q_n2) AS BIGINT) AS score
         FROM sc
         WHERE dot > 0
           AND CAST(dot AS HUGEINT) * dot * 100
               >= 4 * (CAST(n2 AS HUGEINT) * q_n2)""",
    "q_similarity_topk" ->
      """WITH e AS (
           SELECT vec_id, label,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
           FROM embeddings),
         n AS (
           SELECT vec_id, label, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
           FROM e),
         q AS (SELECT qv AS q_qv, n2 AS q_n2 FROM n WHERE vec_id = 0),
         sc AS (
           SELECT n.vec_id, n.label,
             CAST(list_sum(list_transform(list_zip(n.qv, q.q_qv),
               t -> t[1] * t[2])) AS BIGINT) AS dot,
             n.n2, q.q_n2
           FROM n, q WHERE n.vec_id <> 0 AND n.n2 > 0)
         SELECT vec_id, label,
           CAST((CASE WHEN dot < 0 THEN -1 ELSE 1 END) *
             ((CAST(dot AS HUGEINT) * dot * 1000000000000) //
              (CAST(n2 AS HUGEINT) * q_n2)) AS BIGINT) AS score
         FROM sc
         ORDER BY score DESC, vec_id ASC
         LIMIT 10""",
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
