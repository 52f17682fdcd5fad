package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Text-analysis operators for training-data pipelines (north-star
  * surface): language-ID heuristic, quality scoring, BPE-ish token
  * counting, rolling-hash fingerprinting. All per-document map-side work —
  * no shuffle except the presentation sort, so these scale linearly.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Function-word marker lists per language (public-knowledge stopword
    * heads). Scoring = |distinct tokens ∩ markers| per language. */
  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  private val stopwords = markers("en")

  /** n-gram-heuristic language ID: count function-word markers per
    * language, argmax with 'und' (undetermined) fallback when all scores
    * are 0. (The fixture corpus is an English-ish word soup with random
    * `lang` labels, so the *mechanics* are what's verified.) */
  val qTextLangid: Q = (s, d) => {
    val toks = array_distinct(split(lower(col("text")), " "))
    val scoreOf = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      size(array_intersect(toks, array(ms.map(lit): _*))).as(s"score_$lang")
    }
    val best = markers.toSeq.sortBy(_._1).map { case (lang, _) =>
      struct(col(s"score_$lang").as("score"), lit(lang).as("lang"))
    }
    Tables.documents(s, d)
      .select(col("doc_id") +: scoreOf: _*)
      .withColumn("best", greatest(best: _*))
      .select(col("doc_id"), col("score_en"), col("score_de"), col("score_fr"),
        col("score_es"),
        when(greatest(col("score_en"), col("score_de"), col("score_fr"),
          col("score_es")) === 0, "und")
          .otherwise(col("best.lang")).as("pred_lang"))
      .orderBy("doc_id")
  }

  /** Quality scoring: token count, stopword count, stopword ratio (one
    * exact-int IEEE division → deterministic), mean token length as
    * integer sums, shortness flag. */
  val qTextQuality: Q = (s, d) => {
    val toks = split(lower(col("text")), " ")
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(toks).as("n_tokens"),
        size(filter(toks, t => t.isInCollection(stopwords))).as("n_stop"),
        aggregate(transform(toks, t => length(t)), lit(0),
          (acc, x) => acc + x).as("char_sum"))
      .withColumn("stop_ratio", col("n_stop").cast(DoubleType) / col("n_tokens"))
      .withColumn("is_short", col("n_tokens") < 20)
      .orderBy("doc_id")
  }

  /** BPE-ish token counting: regex token classes (letter runs, digit runs,
    * other non-space singletons) vs whitespace tokens. */
  val qTextTokenCount: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).as("n_bpeish"),
        size(split(col("text"), " ")).as("n_ws"))
      .orderBy("doc_id")

  /** Document fingerprint: polynomial rolling hash over characters,
    * h = fold(h*31 + ascii(c)) mod 1e9+7 — exact integer fold, identical
    * in both engines (DuckDB list_reduce oracle). */
  val qTextFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        aggregate(transform(split(col("text"), ""), c => ascii(c).cast(LongType)),
          lit(0L), (h, c) => pmod(h * 31 + c, lit(1000000007L))).as("fp"))
      .orderBy("doc_id")

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_text_langid" -> qTextLangid,
    "q_text_quality" -> qTextQuality,
    "q_text_token_count" -> qTextTokenCount,
    "q_text_fingerprint" -> qTextFingerprint)

  val oracleSql: Map[String, String] = Map(
    "q_text_langid" ->
      """WITH sc AS (
           SELECT doc_id,
             CAST(len(list_intersect(toks, ['the','a','of','and','in','to'])) AS INT) AS score_en,
             CAST(len(list_intersect(toks, ['der','die','das','und','ist'])) AS INT) AS score_de,
             CAST(len(list_intersect(toks, ['le','la','les','et','est'])) AS INT) AS score_fr,
             CAST(len(list_intersect(toks, ['el','los','las','y','es'])) AS INT) AS score_es
           FROM (SELECT doc_id,
                   list_distinct(string_split(lower(text), ' ')) AS toks
                 FROM documents))
         SELECT doc_id, score_en, score_de, score_fr, score_es,
           CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0
                THEN 'und'
                -- argmax with ties resolved to the lexicographically
                -- largest language code, matching Spark's greatest() over
                -- struct(score, lang): fr > es > en > de on ties
                WHEN score_fr >= score_es AND score_fr >= score_en
                     AND score_fr >= score_de THEN 'fr'
                WHEN score_es >= score_en AND score_es >= score_de THEN 'es'
                WHEN score_en >= score_de THEN 'en'
                ELSE 'de' END AS pred_lang
         FROM sc ORDER BY doc_id""",
    "q_text_quality" ->
      """SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_filter(toks,
             t -> t IN ('the','a','of','and','in','to'))) AS INT) AS n_stop,
           CAST(list_sum(list_transform(toks, t -> len(t))) AS INT) AS char_sum,
           CAST(len(list_filter(toks,
             t -> t IN ('the','a','of','and','in','to'))) AS DOUBLE)
             / len(toks) AS stop_ratio,
           len(toks) < 20 AS is_short
         FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents)
         ORDER BY doc_id""",
    "q_text_token_count" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS n_bpeish,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws
         FROM documents ORDER BY doc_id""",
    "q_text_fingerprint" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (h, c) -> (h * 31 + c) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""")
}
