package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** English function-word markers — the shared stop-word list every
    * quality/sampling operator scores against (public: CorpusPipeline's
    * quality tiers use the same list, and two divergent copies would
    * silently disagree on what "quality" means). */
  val stopwords: Seq[String] = markers("en")

  /** Polynomial rolling-hash fingerprint of a string column,
    * h = fold(h·31 + ascii(c)) mod 1e9+7 — exact integer fold, identical
    * in both engines (DuckDB list_reduce oracle). Shared by
    * [[qTextFingerprint]] and CorpusPipeline's curate annotation so the
    * canonical fingerprint cannot fork. */
  def fingerprint(c: Column): Column =
    aggregate(transform(split(c, ""), ch => ascii(ch).cast(LongType)),
      lit(0L), (h, ch) => pmod(h * 31 + ch, lit(1000000007L)))

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
  }

  /** Gopher-style heuristic quality gate (Rae et al. 2021 §A1.1, public
    * rule set): word-count bounds, mean-word-length bounds, symbol-word
    * ratio, alphabetic-word fraction, stop-word floor, AND-composed into
    * a keep flag. Every ratio rule is stated in cross-multiplied integer
    * arithmetic (e.g. 5·n_alpha ≥ 4·n_words for the 80% rule) so the
    * whole gate is float-free and exactly oracle-checkable. Pure
    * map-side HOF work — zero shuffles, linear at any corpus size. */
  def gopherGate(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    val ruleWc = col("n_words").between(50L, 100000L)
    val ruleMwl = lit(3) * col("n_words") <= col("char_sum") &&
      col("char_sum") <= lit(10) * col("n_words")
    val ruleSym = lit(10) * col("n_sym") <= col("n_words")
    val ruleAlpha = lit(5) * col("n_alpha") >= lit(4) * col("n_words")
    val ruleStop = col("n_stop") >= 2
    docs
      .select(col("doc_id"),
        size(toks).cast(LongType).as("n_words"),
        aggregate(transform(toks, t => length(t).cast(LongType)), lit(0L),
          (acc, x) => acc + x).as("char_sum"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast(LongType).as("n_alpha"),
        size(filter(toks, t => t.rlike("[^a-z0-9]"))).cast(LongType).as("n_sym"),
        size(filter(toks, t => t.isInCollection(stopwords))).cast(LongType)
          .as("n_stop"))
      .select(col("*"),
        ruleWc.as("r_wordcount"), ruleMwl.as("r_meanlen"),
        ruleSym.as("r_symbols"), ruleAlpha.as("r_alpha"),
        ruleStop.as("r_stopwords"),
        (ruleWc && ruleMwl && ruleSym && ruleAlpha && ruleStop).as("keep"))
  }

  val qTextGopher: Q = (s, d) => gopherGate(Tables.documents(s, d))

  /** BPE-ish token counting: regex token classes (letter runs, digit runs,
    * other non-space singletons) vs whitespace tokens. */
  val qTextTokenCount: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).as("n_bpeish"),
        size(split(col("text"), " ")).as("n_ws"))

  /** Document fingerprint: polynomial rolling hash over characters,
    * h = fold(h*31 + ascii(c)) mod 1e9+7 — exact integer fold, identical
    * in both engines (DuckDB list_reduce oracle). */
  val qTextFingerprint: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** TF-IDF term statistics per (doc, token): tf and df as exact longs.
    * The declared (oracle-hashed) output is integer-only — the ln-based
    * score lives in [[tfidfScored]], verified in-JVM instead, because
    * floor(tf · ln(N/df) · 1e6) depends on the JVM's and DuckDB's libm
    * agreeing to the last ulp: true on this host, but not a guarantee a
    * cross-engine hash gate should rest on (a 1-ulp ln difference flips
    * floor when the true value sits within ~1e-9 of an integer).
    *
    * 100 TB shape: two token-keyed shuffles (tf, then df) plus one
    * up-front corpus count for N — df and N are corpus-level ingest
    * artifacts in a real pipeline, making scoring itself map-side. */
  val qTextTfidf: Q = (s, d) =>
    tfStats(Tables.documents(s, d)).orderBy("doc_id", "tok")

  /** Exact (doc, token) → tf, df longs over any (doc_id, text) frame. */
  def tfStats(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "tok").select("doc_id", "tok", "tf", "df")
  }

  /** [[tfStats]] plus the micro-nat-quantized score
    * floor(tf · ln(N/df) · 1e6). Single-ln-implementation determinism:
    * Spark's `log` and the scalatest expectation both run
    * `java.lang.Math.log` in this JVM, so the floored integer is
    * reproducible — it is just not declared for the cross-engine hash
    * gate (see [[qTextTfidf]]). N is fetched once up front (corpus-level
    * ingest artifact; inlining keeps the scoring plan join-free — a 1-row
    * cross join would plan as a nested-loop join). */
  def tfidfScored(docs: DataFrame): DataFrame = {
    val nDocs = docs.count()
    tfStats(docs)
      .withColumn("tfidf_micro",
        floor(col("tf") * log(lit(nDocs).cast(DoubleType) / col("df"))
          * lit(1000000.0)))
  }

  /** BM25 term statistics per (doc, token) with the saturation term as
    * an EXACT integer rational. With k1 = 1.2, b = 0.75 and
    * avgdl = T/N (T = corpus token count, N = doc count), the BM25
    * saturation tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) multiplied
    * through by 10·T becomes
    *
    *   sat = 22·T·tf / (10·T·tf + 3·T + 9·N·dl)
    *
    * — a ratio of exact longs, so `sat_num`/`sat_den` are declared
    * (oracle-hashed) alongside tf, df, dl. The ln-based idf factor lives
    * in [[bm25Scored]], JVM-verified, for the same 1-ulp floor-flip
    * reason as [[qTextTfidf]]. Long headroom: sat_num < 22·T·max(tf) —
    * fine through corpus sizes of ~10¹⁴ tokens; past that, swap the two
    * product columns to DECIMAL(38,0) (the rationalization itself is
    * scale-free).
    *
    * 100 TB shape: two exchanges, same count as tf-idf — the (doc, tok)
    * aggregate then one tok repartition for the df window count; T and
    * N are corpus-level scalars (ingest artifacts in a real pipeline —
    * fetched once PER SESSION through the memoized scalar artifact and
    * inlined as literals so the scoring plan stays free of a 1-row
    * nested-loop join and steady-state plan construction is job-free). */
  val qTextBm25: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    bm25Stats(docs,
      knownTN = Some(Artifacts.scalar(s"bm25tn:$d")(corpusTokenStats(docs))))
  }

  /** (total tokens, doc count) — the two corpus scalars BM25 inlines. */
  def corpusTokenStats(docs: DataFrame): (Long, Long) = {
    val tot = docs
      .select(size(split(lower(col("text")), " ")).cast(LongType).as("dl"))
      .agg(sum(col("dl")), count(lit(1))).head()
    // sum() is null on an empty corpus; the stats frame is empty then too
    (if (tot.isNullAt(0)) 0L else tot.getLong(0), tot.getLong(1))
  }

  /** Exact (doc, token) → tf, df, dl, sat_num, sat_den longs over any
    * (doc_id, text) frame. Two plan choices keep this at two exchanges
    * (PlanQualitySpec's budget): dl rides THROUGH the tf groupBy
    * (constant per doc, so max() is exact) instead of joining back on
    * doc_id, and df is a tok-partitioned window count over the tf frame
    * instead of a second aggregate + join-back — tf-idf's join shape
    * only stays at two exchanges because both branches compute an
    * identical frame (ReusedExchange); here the extra dl column would be
    * pruned off the df branch, breaking the reuse. */
  def bm25Stats(docs: DataFrame,
      knownTN: Option[(Long, Long)] = None): DataFrame = {
    val (t, n) = knownTN.getOrElse(corpusTokenStats(docs))
    docs
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast(LongType).as("dl"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("tok")))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("dl"),
        (lit(22L * t) * col("tf")).as("sat_num"),
        (lit(10L * t) * col("tf") + lit(3L * t) + lit(9L * n) * col("dl"))
          .as("sat_den"))
  }

  /** [[bm25Stats]] plus the micro-quantized Lucene-form score
    * floor(ln(1 + (N − df + 0.5)/(df + 0.5)) · sat · 1e6) — the
    * always-positive idf variant, so rare terms score high and terms in
    * every document score near zero rather than negative. */
  def bm25Scored(docs: DataFrame): DataFrame = {
    val nDocs = docs.count()
    bm25Stats(docs)
      .withColumn("bm25_micro",
        floor(log(lit(1.0) +
            (lit(nDocs.toDouble) - col("df") + lit(0.5)) /
              (col("df") + lit(0.5)))
          * col("sat_num") / col("sat_den") * lit(1000000.0)))
  }

  /** Corpus bigram counts (n-gram generation for LM data statistics):
    * adjacent-token pairs generated map-side, then one token-pair-keyed
    * groupBy. n = total occurrences, n_docs = documents containing the
    * bigram. r18: pairs come from zipping the token array with its own
    * 1-shifted slice (the r17 skipgram device — no per-element sequence
    * materialization or element_at index arithmetic); arrays_zip pads
    * the last position with a NULL context, which the isNotNull filter
    * drops — exactly the adjacent pairs the index form produced. */
  val qTextNgrams: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 2)
    docs
      .select(col("doc_id"),
        explode(arrays_zip(col("toks"),
          slice(col("toks"), lit(2),
            greatest(size(col("toks")) - 1, lit(0))))).as("p"))
      .filter(col("p.1").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("p.toks"), col("p.1")).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("n_docs"))
  }

  /** BPE merge-pair counting — the tokenizer-training inner loop at
    * corpus scale: for every adjacent character pair inside a word, the
    * total corpus occurrence count (weighted by word frequency) and the
    * number of distinct words containing it; the top pair is the next
    * BPE merge. Runs SET-CONTRACTED: one corpus pass builds the
    * (word, freq) vocabulary — at 100 TB the vocab table is MBs where
    * the corpus is TBs — and the quadratic-ish pair explode touches only
    * distinct words, weighted by freq on the way back out. Exact longs →
    * DuckDB oracle. */
  val qTextBpePairs: Q = (s, d) => {
    val vocab = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    vocab
      .select(col("word"), col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair")
      .agg(sum(col("freq")).as("n_occ"),
        count_distinct(col("word")).as("n_words"))
  }

  /** Full BPE merge-table TRAINING (Sennrich et al. 2016, the public
    * subword-tokenizer recipe) — the iterative closure of
    * [[qTextBpePairs]]'s single pair count: `rounds` greedy merges, each
    * round picking the highest-weighted adjacent symbol pair
    * (count desc, pair asc tiebreak — total order, engine-exact) and
    * merging it left-to-right non-overlapping across the vocabulary.
    *
    * Scale shape — the reason BPE training is feasible on a petabyte
    * corpus at all is SET CONTRACTION: ONE corpus pass builds the
    * (word, freq) vocabulary (MBs where the corpus is TBs; HuggingFace's
    * trainer does exactly this), checkpointed once, and every round then
    * runs on the vocab alone — a pair explode + hash agg + top-1, all
    * jobs bounded by vocab size, never corpus size. Like the IVF/PQ/
    * logistic artifacts, training is an EAGER once-per-corpus ingest
    * step (k small argmax jobs at build; memoized via Artifacts so
    * repeated evaluation reuses the merge table).
    *
    * Exactness: symbols ride as space-joined strings and the merge is
    * `replace(' '||sym||' ', ' a b ', ' ab ')` — sequential
    * non-overlapping scan, IDENTICAL semantics in Java's String.replace
    * and DuckDB's replace (e.g. 'a a a' → 'aa a', never 'a aa'), so the
    * k-round unrolled oracle reproduces the training bit-for-bit. All
    * counts exact longs. */
  def bpeTrain(docs: DataFrame, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val vocab0 = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("n"),
        trim(regexp_replace(col("word"), "(.)", "$1 ")).as("sym"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var vocab = vocab0
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      val toksC = split(col("sym"), " ")
      val best = vocab
        .filter(size(toksC) >= 2)
        .select(col("n"), explode(transform(sequence(lit(1), size(toksC) - 1),
          i => concat(element_at(toksC, i), lit(" "),
            element_at(toksC, i + 1)))).as("pair"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val merged = pair.replace(" ", "")
        merges += ((r + 1, pair, merged, best(0).getLong(1)))
        // Merge application on a DOUBLED-space representation: with
        // single spaces, replace(' a b ', ...) on 'a a a a' consumes the
        // shared boundary space and misses the adjacent occurrence
        // (yielding 'aa a a' instead of canonical 'aa aa'). Doubling the
        // separators gives every occurrence its own delimiter on each
        // side, so the left-to-right scan merges exactly the
        // non-overlapping occurrences Sennrich BPE specifies; collapsing
        // the doubles afterwards restores the single-space form.
        val dblPair = pair.replace(" ", "  ")
        vocab = vocab.select(col("n"),
          trim(call_function("replace",
            call_function("replace",
              concat(lit(" "),
                call_function("replace", col("sym"), lit(" "), lit("  ")),
                lit(" ")),
              lit(s" $dblPair "), lit(s" $merged ")),
            lit("  "), lit(" "))).as("sym"))
          .localCheckpoint(true)
        r += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "pair", "merged", "cnt")
  }

  private val bpeCache =
    scala.collection.concurrent.TrieMap[(String, Int), DataFrame]()

  private val vocabCache =
    scala.collection.concurrent.TrieMap[String, (DataFrame, Long)]()

  private val unigramCache = scala.collection.concurrent
    .TrieMap[String, (DataFrame, Long, Long)]()

  /** Drop cached BPE/vocab/unigram artifacts (see
    * DedupQueries.clearArtifacts). Checkpointed frames release via GC. */
  def clearArtifacts(): Unit = {
    bpeCache.clear()
    vocabCache.clear()
    unigramCache.clear()
  }

  val BpeRounds = 6

  /** Declared query: the 6-round BPE merge table for the corpus. */
  val qTextBpeTrain: Q = (s, d) =>
    Artifacts.memo(bpeCache, (d, BpeRounds))(
      bpeTrain(Tables.documents(s, d), BpeRounds))

  private def bpeTrainOracle(rounds: Int): String = {
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (
           SELECT pr.pair, CAST(SUM(v.n) AS BIGINT) AS cnt
           FROM v${r - 1} v, LATERAL (
             SELECT unnest(list_transform(
               generate_series(1, len(string_split(v.sym, ' ')) - 1),
               i -> string_split(v.sym, ' ')[i] || ' ' ||
                    string_split(v.sym, ' ')[i + 1])) AS pair) pr
           GROUP BY pr.pair),
         b$r AS (SELECT $r AS rank, pair, replace(pair, ' ', '') AS merged,
                   cnt
                 FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         v$r AS (
           SELECT v.n, trim(replace(replace(
               ' ' || replace(v.sym, ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b$r), ' ', '  ') || ' ',
               ' ' || (SELECT merged FROM b$r) || ' '),
               '  ', ' ')) AS sym
           FROM v${r - 1} v)"""
    }.mkString(",\n         ")
    val union = (1 to rounds)
      .map(r => s"SELECT rank, pair, merged, cnt FROM b$r")
      .mkString("\n         UNION ALL ")
    s"""WITH w AS (
           SELECT unnest(string_split(lower(text), ' ')) AS word
           FROM documents),
         v0 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
           FROM w WHERE len(word) > 0 GROUP BY word),
         $stages
         $union
         ORDER BY rank"""
  }

  /** Winnowing fingerprints (Schleimer et al. 2003 — the MOSS local
    * document-fingerprinting algorithm): hash every k=5 char-gram with
    * the shared polynomial [[fingerprint]] hash, slide a w=4 window
    * over the gram-hash stream, keep each window's MINIMUM — the local
    * sampling that guarantees any match of length ≥ w+k−1 shares a
    * fingerprint, which is what makes it the near-dup/contamination
    * primitive plain shingle sampling isn't. Declared output per doc:
    * gram count, DISTINCT fingerprint count, and their exact integer
    * sum (the content-sensitive digest; canonical winnowing dedups
    * consecutive equal minima — the distinct-set contraction is the
    * declared variant and subsumes it).
    *
    * 100 TB shape: pure map-side HOF work (nested transform/slice over
    * per-doc arrays), zero shuffles, linear in corpus size; the
    * fingerprint SET (not emitted here) is what an ingest job would
    * explode into the (fingerprint → doc) inverted index for
    * cross-doc matching. */
  val qTextWinnowing: Q = (s, d) => {
    val k = 5
    val w = 4
    val txt = lower(col("text"))
    val nGrams = greatest(length(txt) - (k - 1), lit(0))
    val grams = when(nGrams >= 1,
      transform(sequence(lit(1), nGrams),
        i => fingerprint(txt.substr(i, lit(k)))))
      .otherwise(array().cast("array<bigint>"))
    val wins = when(col("n_grams") - (w - 1) >= 1,
      transform(sequence(lit(1L), col("n_grams") - (w - 1)),
        j => array_min(slice(col("grams"), j, lit(w)))))
      .otherwise(array().cast("array<bigint>"))
    Tables.documents(s, d)
      .select(col("doc_id"), nGrams.cast("long").as("n_grams"),
        grams.as("grams"))
      .select(col("doc_id"), col("n_grams"),
        array_distinct(wins).as("fps"))
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        aggregate(col("fps"), lit(0L), (acc, x) => acc + x).as("fp_sum"))
  }

  /** BPE ENCODE — the tokenizer-APPLICATION closure of [[qTextBpeTrain]]:
    * run the corpus's trained merge ladder over every document and
    * report exact per-doc token accounting (words, pre-merge symbols =
    * characters, post-merge tokens) — the "how many tokens is this
    * corpus under MY tokenizer" question every training-data budget
    * starts with.
    *
    * The merge table rides as a driver-side scalar artifact (≤
    * [[BpeRounds]] (pair, merged) strings collected ONCE from the
    * memoized train artifact — the IVF-centroid precedent), unrolled
    * into a chained-replace expression with the same doubled-space
    * non-overlapping-scan device the trainer uses, so encode(word)
    * reproduces the trainer's symbol stream bit-for-bit.
    *
    * Scale shape — SET CONTRACTION again: the expensive chained
    * replace runs once per DISTINCT word (the vocabulary, one
    * exchange), and the corpus meets the word→n_tokens lookup on a
    * word-keyed equi-join with NO forced broadcast: by Heaps' law a
    * web-scale vocabulary is 10⁷–10⁹ rows, so the hint must stay a
    * stats/AQE decision (it still broadcasts whenever the vocab
    * genuinely fits). The per-doc rollup is the only corpus-keyed
    * exchange. The oracle re-derives the merge ladder independently
    * via the unrolled k-round SQL and re-applies it per word. */
  val qTextBpeEncode: Q = (s, d) => {
    val merges: Seq[(String, String)] =
      Artifacts.scalar(s"bpe-merges:$d:$BpeRounds") {
        qTextBpeTrain(s, d).orderBy("rank").collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq
      }
    def applyMerges(sym0: Column): Column =
      merges.foldLeft(sym0) { case (sym, (pair, merged)) =>
        val dbl = pair.replace(" ", "  ")
        trim(call_function("replace",
          call_function("replace",
            concat(lit(" "),
              call_function("replace", sym, lit(" "), lit("  ")),
              lit(" ")),
            lit(s" $dbl "), lit(s" $merged ")),
          lit("  "), lit(" ")))
      }
    val words = Tables.documents(s, d)
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val encVocab = words.select("word").distinct()
      .select(col("word"), size(split(applyMerges(
        trim(regexp_replace(col("word"), "(.)", "$1 "))), " "))
        .cast("long").as("wtok"))
    words.join(encVocab, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_syms"),
        sum(col("wtok")).as("n_tokens"))
  }

  private def bpeEncodeOracle(rounds: Int): String = {
    // re-derives the merge ladder with the train oracle's CTE stages,
    // then applies it per distinct word; chr(1) sentinel keeps an
    // exhausted round (empty b_r) a no-op instead of a NULL poison
    val stages = (1 to rounds).map { r =>
      s"""p$r AS (
           SELECT pr.pair, CAST(SUM(v.n) AS BIGINT) AS cnt
           FROM v${r - 1} v, LATERAL (
             SELECT unnest(list_transform(
               generate_series(1, len(string_split(v.sym, ' ')) - 1),
               i -> string_split(v.sym, ' ')[i] || ' ' ||
                    string_split(v.sym, ' ')[i + 1])) AS pair) pr
           GROUP BY pr.pair),
         b$r AS (SELECT pair, replace(pair, ' ', '') AS merged
                 FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         v$r AS (
           SELECT v.n, trim(replace(replace(
               ' ' || replace(v.sym, ' ', '  ') || ' ',
               ' ' || coalesce(replace((SELECT pair FROM b$r), ' ', '  '),
                               chr(1)) || ' ',
               ' ' || coalesce((SELECT merged FROM b$r), chr(1)) || ' '),
               '  ', ' ')) AS sym
           FROM v${r - 1} v),
         e$r AS (
           SELECT e.word, trim(replace(replace(
               ' ' || replace(e.sym, ' ', '  ') || ' ',
               ' ' || coalesce(replace((SELECT pair FROM b$r), ' ', '  '),
                               chr(1)) || ' ',
               ' ' || coalesce((SELECT merged FROM b$r), chr(1)) || ' '),
               '  ', ' ')) AS sym
           FROM e${r - 1} e)"""
    }.mkString(",\n         ")
    s"""WITH w AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
           FROM documents),
         v0 AS (
           SELECT CAST(COUNT(*) AS BIGINT) AS n,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
           FROM w WHERE len(word) > 0 GROUP BY word),
         e0 AS (
           SELECT DISTINCT word,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS sym
           FROM w WHERE len(word) > 0),
         $stages,
         lens AS (
           SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT)
             AS wtok
           FROM e$rounds)
         SELECT w.doc_id, COUNT(*) AS n_words,
           CAST(SUM(len(w.word)) AS BIGINT) AS n_syms,
           CAST(SUM(l.wtok) AS BIGINT) AS n_tokens
         FROM w JOIN lens l USING (word)
         WHERE len(w.word) > 0
         GROUP BY w.doc_id ORDER BY w.doc_id"""
  }

  /** PII-style redaction: digit runs → <NUM>, named-entity-ish tokens →
    * <ENT> (the fixture corpus has no digits, so the oracle verifies the
    * <NUM> no-match path; the positive path is unit-tested on
    * digit-bearing rows in TextOpsSpec), with exact per-class match
    * counts. Pure map-side regexp work — the 100 TB cost is one corpus
    * scan. Patterns are word-boundary anchored and identical under Java
    * regex and RE2. */
  val qTextRedact: Q = (s, d) => redactDocs(Tables.documents(s, d))

  /** C4-style text normalization — the cleaning pass every web corpus
    * runs before quality scoring: control characters (U+0000–U+001F,
    * which covers tab/newline/CR) become spaces, space runs collapse to
    * one, and the result is trimmed (whitespace-only docs normalize to
    * the empty string). Reports exact before/after char counts so the
    * downstream mix can audit how much cleaning removed. Pure map-side
    * regexp work, one corpus scan at any scale; both patterns behave
    * identically under Java regex and RE2, so the full cleaned text is
    * oracle-checked byte-for-byte. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(regexp_replace(c, "[\\x00-\\x1f]", " "), " {2,}", " "))

  val qTextClean: Q = (s, d) => {
    val cleaned = cleanText(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), cleaned.as("cleaned"),
        length(col("text")).as("n_before"),
        length(cleaned).as("n_after"))
  }

  /** Redaction over any (doc_id, text) frame — split out so the <NUM>
    * positive path is testable on synthetic digit-bearing rows. */
  def redactDocs(docs: DataFrame): DataFrame = {
    val entPat = "\\b(customer|spark)\\b"
    val numPat = "\\b[0-9]+\\b"
    docs
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"), numPat, "<NUM>"),
          entPat, "<ENT>").as("redacted"),
        size(regexp_extract_all(col("text"), lit(entPat), lit(0))).as("n_ent"),
        size(regexp_extract_all(col("text"), lit(numPat), lit(0))).as("n_num"))
  }

  /** Vocabulary build with coverage: global token counts → top-`k` by
    * (count desc, token) → rank and cumulative coverage. The
    * tokenizer/BPE-prep step of a training pipeline: "which k tokens
    * cover what fraction of the corpus".
    *
    * Scale shape: ONE map-side-combinable count aggregation over the
    * corpus (token-keyed shuffle), then `TakeOrderedAndProject` for the
    * top-k (per-partition heaps, k rows to the driver side of the
    * exchange), then rank/cumsum windows over exactly k rows — the
    * single-partition window is bounded by the constant k, never by
    * corpus size. The corpus token total is a driver-side scalar
    * (ingest-artifact precedent, like q_share_of_total); `cum_pct` is one
    * IEEE divide of exact integers, so it is engine- and
    * partitioning-independent. */
  def vocabTopK(docs: DataFrame, k: Int,
      cacheKey: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE corpus pass: the count table is vocab-sized, so the corpus
    // total is derived from it (sum of counts) rather than a second
    // corpus scan; eager checkpoint materializes it once for both the
    // total and the top-k read. With a cacheKey the (counts, total)
    // pair is a session artifact, so repeated plan construction is
    // job-free (LazyRegistrySpec).
    def build: (DataFrame, Long) = {
      val toks = docs.select(
        explode(split(lower(col("text")), " ")).as("token"))
      val c = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      (c, c.agg(sum(col("cnt"))).head.getLong(0))
    }
    val (counts, total) = cacheKey.fold(build)(ck =>
      Artifacts.memo(vocabCache, ck)(build))
    val topk = counts.orderBy(col("cnt").desc, col("token")).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    topk
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_cnt", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_pct",
        col("cum_cnt").cast("double") / lit(total).cast("double"))
  }

  /** Declared query: top-30 vocabulary with cumulative corpus coverage. */
  val qVocabTopk: Q = (s, d) =>
    vocabTopK(Tables.documents(s, d), k = 30,
      cacheKey = Some(s"vocab:${System.identityHashCode(s)}:$d"))
      .orderBy("rank")

  /** Unigram language-model scoring (the cheap perplexity proxy every
    * corpus-quality pipeline runs — CCNet/Gopher-style filtering uses a
    * real LM; the unigram form keeps the identical Spark shape): train
    * token→count on the corpus itself in ONE explode+agg pass, then
    * score each document by the average negative log-likelihood of its
    * tokens under the add-one-smoothed unigram distribution, and report
    * perplexity = exp(avg NLL). Two keyed shuffles (vocab agg; per-doc
    * agg) + one equality join on `tok` that AQE broadcasts for any
    * corpus whose vocabulary fits (at web scale the join is
    * shuffle-keyed — never a cross product). Tokens never seen in
    * training (impossible here, the corpus scores itself; possible when
    * `model` comes from a different slice) fall back to the smoothing
    * floor count of 0. Float logs → no-oracle class, property-tested
    * against a plain-Scala fold in TextOpsSpec. */
  def unigramLogLoss(docs: DataFrame, model: DataFrame,
      cacheKey: Option[String] = None): DataFrame = {
    // model: (tok, cnt) with total derived; add-one smoothing over V.
    // Materialized once (vocab-sized): both the smoothing-denominator
    // scalars and the scoring join scan it — without this the training
    // explode+agg would run twice per call. With a cacheKey, (model,
    // total, vocab) is a session artifact, so repeated plan
    // construction is job-free (LazyRegistrySpec).
    val (m, total, vocab) = unigramModel(model, cacheKey)
    val toks = docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
    toks.join(m, Seq("tok"), "left")
      .withColumn("logp",
        log((coalesce(col("cnt"), lit(0L)) + 1).cast(DoubleType) /
          lit((total + vocab).toDouble)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (-avg("logp")).as("avg_nll"))
      .withColumn("ppl", exp(col("avg_nll")))
  }

  /** Materialized (model, total token count, vocabulary size) — shared
    * by the float [[unigramLogLoss]] and the declared fixed-point
    * [[qTextPerplexity]]; memoized per cacheKey so repeated plan
    * construction is job-free (LazyRegistrySpec). */
  def unigramModel(model: DataFrame,
      cacheKey: Option[String]): (DataFrame, Long, Long) = {
    def build: (DataFrame, Long, Long) = {
      val mm = model.localCheckpoint(true)
      val stats = mm.agg(sum("cnt").as("total"),
        count(lit(1)).as("vocab")).head()
      // sum() over zero rows aggregates to NULL — surface an empty model
      // (reachable: the docstring supports a model trained on a
      // different slice) as a clear error, not a NullPointerException
      require(!stats.isNullAt(0),
        "unigramLogLoss: empty model (no (tok, cnt) rows) — add-one " +
          "smoothing is undefined with V = 0")
      (mm, stats.getLong(0), stats.getLong(1))
    }
    cacheKey.fold(build)(ck => Artifacts.memo(unigramCache, ck)(build))
  }

  /** Corpus unigram counts — the "model" side of [[unigramLogLoss]]. */
  def unigramCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))

  /** Declared query (oracle-bearing since r15 — the fixed-point integer
    * ln replaced the float-log form): per document, the add-one-smoothed
    * unigram average negative log-likelihood in integer MICRO-NATS —
    * avg_nll_unat = (Σ_tok (lnT − ln(cnt+1))) div (n_tokens·10¹²) with
    * both lns the [[graft.operators.FixedPoint.lnFpStages]] truncated
    * series at scale 10¹⁸ (< 5·10⁻¹¹ relative vs true ln, so the defined
    * value sits within ~10⁻⁴ micro-nats of the float form it replaced;
    * exp/perplexity stays on the float library surface,
    * [[unigramLogLoss]]).
    *
    * Scale shape: ln(cnt+1) is staged on the VOCAB-sized model side
    * before the scoring join — the per-token stream just picks the
    * integer up — and ln(T) constant-folds (T is the corpus-level ingest
    * scalar), so the fixed-point series costs O(vocab), not O(corpus
    * tokens). A token absent from the model (cross-slice scoring) falls
    * back via coalesce to ln(0+1) = 0 exactly. */
  val qTextPerplexity: Q = (s, d) => {
    import graft.operators.FixedPoint._
    val docs = Tables.documents(s, d)
    val (m, total, vocab) = unigramModel(unigramCounts(docs),
      cacheKey = Some(s"unigram:${System.identityHashCode(s)}:$d"))
    val scoredModel = withStages(
        m.withColumn("cnt1", col("cnt") + lit(1L)),
        lnFpStages("cnt1", "c_", SparkFp))
      .select(col("tok"), col("c_ln"))
    // ln(T) is a corpus scalar — the driver-side lnFpScala mirror
    // (bit-equal to the staged form the oracle runs) keeps the plan
    // free of a 30-stage constant-folding chain
    val tLn = scala.math.BigDecimal(lnFpScala(total + vocab))
    docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .join(scoredModel, Seq("tok"), "left")
      .withColumn("nll_fp",
        lit(tLn).cast("decimal(38,0)") -
          coalesce(col("c_ln"), lit(0L).cast("decimal(38,0)")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("nll_fp").as("sum_nll"))
      .select(col("doc_id"), col("n_tokens"),
        // n_tokens goes through DECIMAL(38,0) before the 10¹² scale-up:
        // a BIGINT multiply would wrap silently past ~9.2M tokens/doc
        // (ANSI off) where the DuckDB oracle's int128 stays exact
        expr("CAST(sum_nll div (CAST(n_tokens AS DECIMAL(38,0)) * " +
            "1000000000000) AS BIGINT)")
          .as("avg_nll_unat"))
  }

  /** Inverted index in its scale-honest FLAT form: one row per (token,
    * document) posting carrying tf, the in-document position list (CSV —
    * the driver comparator can't hash array cells) and df. This is how a
    * 100 TB index is actually stored — a (tok, doc_id)-keyed table,
    * bucketed by token on disk — NOT per-token array cells: a
    * collect-per-token posting array for a stop word would be a 10¹⁰
    * element cell on one executor, where the flat table spreads the same
    * posting list across ordinary partitions. The position list per
    * (tok, doc) row IS safely collectable — it is bounded by document
    * length, not corpus size.
    *
    * Two exchanges, same budget as [[bm25Stats]]: the (doc, tok)
    * aggregate, then a tok-partitioned window for df. */
  def invertedIndex(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs
      .select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "tok")))
      .groupBy("tok", "doc_id")
      .agg(count(lit(1)).as("tf"),
        array_join(transform(sort_array(collect_list(col("pos"))),
          _.cast(StringType)), ",").as("pos_csv"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("tok")))
  }

  val qIndexInverted: Q = (s, d) => invertedIndex(Tables.documents(s, d))

  /** Skip-gram pair counts — the word2vec / PMI co-occurrence prep: for
    * every token and every context token at distance k ≤ `maxDist` to
    * its right, the corpus occurrence count and distinct-document count,
    * keyed by (word, context, distance). Pairs are generated MAP-SIDE by
    * an index-sequence HOF (filter the position list so i+k stays in
    * range — `sequence` is never called with start > stop, which would
    * flip it descending), so the only data that shuffles is the
    * pair-keyed partial counts; per-doc work is O(len · maxDist), never
    * the len² of an unwindowed co-occurrence join. Exact longs → DuckDB
    * oracle (PMI's ln() belongs to the JVM-verified float tier, per the
    * tf-idf precedent). */
  def skipgramPairs(docs: DataFrame, maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1)
    val withToks = docs.withColumn("toks", split(lower(col("text")), " "))
    // r17: pairs at distance k come from zipping the token array with
    // its own k-shifted slice instead of the index-sequence HOF — the
    // zip walks both arrays positionally (no per-element sequence
    // materialization, bounds filter, or element_at index arithmetic).
    // arrays_zip pads the k-long tail with NULL context, which the
    // post-explode isNotNull filter drops — exactly the pairs the
    // bounds-checked index form produced (corpus sums verified
    // identical; 0.84 → 0.73 s at local[32]/sf0.1).
    def pairsAt(k: Int): Column =
      transform(
        arrays_zip(col("toks"),
          slice(col("toks"), lit(k + 1),
            greatest(size(col("toks")) - k, lit(0)))),
        p => struct(p.getField("toks").as("w"),
          p.getField("1").as("c"), lit(k).as("k")))
    withToks
      .select(col("doc_id"),
        explode(concat((1 to maxDist).map(pairsAt): _*)).as("p"))
      .select(col("doc_id"), col("p.w"), col("p.c"), col("p.k"))
      .filter(col("c").isNotNull)
      .groupBy("w", "c", "k")
      .agg(count(lit(1)).as("n"), count_distinct(col("doc_id")).as("n_docs"))
  }

  val qTextSkipgrams: Q = (s, d) => skipgramPairs(Tables.documents(s, d))

  /** Adjacent-bigram collocation mining (Smadja 1993's n-gram
    * association stage) scored by the Dice coefficient in exact ppm:
    * dice = 2·c(w,c)·10⁶ div (c(w) + c(c)) over corpus-wide bigram and
    * unigram counts, floored at `minPairs` occurrences (the A-Priori
    * prune that keeps the pair table sub-quadratic in the vocabulary).
    * Dice is the classic collocation measure that needs no logarithm —
    * PMI's ln() stays in the JVM float tier ([[skipgramPairs]] note),
    * while the Dice rational is integer-exact cross-engine.
    *
    * 100 TB shape: bigrams generate MAP-SIDE (the [[skipgramPairs]]
    * index-HOF device — per-doc work is O(len)); only pair-keyed
    * partial counts shuffle, once; the unigram table contracts to the
    * vocabulary and meets the pruned pair table on plain w/c-keyed
    * equi-joins — NO forced broadcast, because the vocabulary is
    * unbounded (Heaps' law: 10⁷–10⁹ distinct tokens at web scale);
    * AQE still broadcasts when the vocab genuinely fits.
    * Headroom: 2·c_ab·10⁶ rides decimal(38) past 10³⁰ pair
    * occurrences. */
  def collocations(docs: DataFrame, minPairs: Long = 5L): DataFrame = {
    val withToks = docs.withColumn("toks", split(lower(col("text")), " "))
    // r18: bigrams via the shifted-slice arrays_zip device (the r17
    // skipgram rewrite at k = 1), KEEPING the NULL-padded tail row: the
    // zip is exactly one row per token POSITION (each token appears
    // once as `w`, paired with its successor or with NULL at
    // end-of-doc), so the unigram counts re-derive from the pair table
    // itself — n_tok(t) = Σ_c n_ab(t, c) including the NULL-context
    // row — replacing the corpus-wide token explode + string-keyed
    // unigram rollup with a vocabulary-sized regroup of pair partials.
    // Honest plan note (graft.tools.ExplainFinal): the planner still
    // materializes the pair subtree once per consumer (differently
    // pruned, so no ReuseExchange), so this is not literally one corpus
    // pass — the measured win is per-pass cost (positional zip vs
    // index-HOF + the cheaper unigram derivation): 0.49–0.65 s vs
    // 0.61–0.76 back-to-back at local[32]/sf0.1 and ~2.2× at the 10×
    // mirror. Counts provably identical; oracle re-verified at sf0.01,
    // sf0.1 and the mirror.
    val pairCounts = withToks
      .select(explode(arrays_zip(col("toks"),
        slice(col("toks"), lit(2),
          greatest(size(col("toks")) - 1, lit(0))))).as("p"))
      .select(col("p.toks").as("w"), col("p.1").as("c"))
      .groupBy("w", "c").agg(count(lit(1)).as("n_ab"))
    val unigrams = pairCounts.groupBy(col("w").as("tok"))
      .agg(sum(col("n_ab")).as("n_tok"))
    val bigrams = pairCounts
      .filter(col("c").isNotNull && col("n_ab") >= minPairs)
    bigrams
      .join(unigrams.select(col("tok").as("w"),
        col("n_tok").as("n_w")), "w")
      .join(unigrams.select(col("tok").as("c"),
        col("n_tok").as("n_c")), "c")
      .select(col("w"), col("c"), col("n_ab"), col("n_w"), col("n_c"),
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 2000000" +
          " div (n_w + n_c) AS LONG)").as("dice_ppm"))
  }

  val qTextColloc: Q = (s, d) => collocations(Tables.documents(s, d))

  /** Hashing-trick featurization (Weinberger et al. 2009, the
    * fixed-width sparse text featurizer): each token hashes to one of
    * `nBuckets` feature slots (16 md5 bits via the engine's standard
    * hex-prefix device — deterministic and identical in DuckDB), per-doc
    * slot counts become a sorted `bucket:count` CSV sparse vector. No
    * vocabulary pass, no fit/transform state — the dimensionality is
    * fixed up front, which is the whole point of the trick at corpus
    * scale. Two doc-keyed exchanges ((doc, bucket) fold, then per-doc
    * assembly); the per-doc collect is bounded by `nBuckets`. */
  def hashFeatures(docs: DataFrame, nBuckets: Int = 256): DataFrame =
    docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .select(col("doc_id"),
        (graft.functions.Md5Draws24.md5Prefix(col("tok"), 4)
          % nBuckets).as("bucket"))
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_features"),
        array_join(transform(
          array_sort(collect_list(struct(col("bucket"), col("cnt")))),
          x => concat(x.getField("bucket").cast(StringType), lit(":"),
            x.getField("cnt").cast(StringType))),
          " ").as("features"))

  val qTextHashFeatures: Q = (s, d) => hashFeatures(Tables.documents(s, d))

  // ---- registry ---------------------------------------------------------

  /** Language-ID confusion matrix: the n-gram classifier's predictions
    * ([[qTextLangid]]) cross-tabulated against the declared `lang`
    * label — the evaluation rollup run before trusting a classifier to
    * gate a corpus. Pure composition: the per-doc prediction plan plus
    * one broadcast label join and a 2-key count. */
  val qLangidConfusion: Q = (s, d) =>
    qTextLangid(s, d).select(col("doc_id"), col("pred_lang"))
      .join(Tables.documents(s, d).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))

  /** Vocabulary coverage per source: the share of token OCCURRENCES
    * covered by the global top-30 vocabulary ([[vocabTopK]]) — the
    * tokenizer-planning number that says how far a small vocab goes on
    * each slice (exact ppm, integer division). The top-k set broadcasts
    * onto the token stream; one source-keyed aggregate. */
  val qVocabCoverage: Q = (s, d) => {
    val top = vocabTopK(Tables.documents(s, d), k = 30,
        cacheKey = Some(s"vocab:${System.identityHashCode(s)}:$d"))
      .select(col("token"), lit(1).as("in_top"))
    Tables.documents(s, d)
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("token"))
      .join(broadcast(top), Seq("token"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("total_tokens"),
        count(col("in_top")).as("covered_tokens"))
      .withColumn("covered_ppm",
        expr("covered_tokens * 1000000 div total_tokens"))
  }

  /** Zipf-conformance audit of the head vocabulary — the corpus-health
    * screen: under Zipf's law freq(r) ≈ freq(1)/r, so the exact ppm
    * readout `zipf_ppm = freq(r)·r·10⁶ div freq(1)` reads ~10⁶ flat on
    * a natural corpus and drifts hard on template/boilerplate-heavy or
    * synthetic text (a flat head → ppm grows linearly with rank; a
    * single-token spam corpus → collapses toward 0 past rank 1).
    * Rides the session vocab artifact ([[vocabTopK]]'s counts/total
    * pair, k-independent), so the corpus scans once across all vocab
    * consumers; everything here is arithmetic over the 50-row top-k.
    * Headroom: cnt·rank·10⁶ in decimal(38) past 10²⁸ occurrences. */
  val qTextZipf: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    vocabTopK(Tables.documents(s, d), k = 50,
      cacheKey = Some(s"vocab:${System.identityHashCode(s)}:$d"))
      .withColumn("f1",
        max(when(col("rank") === 1, col("cnt")))
          .over(Window.partitionBy()))
      .select(col("rank"), col("token"), col("cnt"),
        expr("""CAST((CAST(cnt AS DECIMAL(38,0)) * rank * 1000000)
                div f1 AS LONG)""").as("zipf_ppm"))
  }

  /** Token burstiness for the head vocabulary — Church & Gale's
    * corpus-linguistics diagnostic: burst = CF/DF, the mean occurrences
    * per CONTAINING document, emitted as the exact milli integer
    * `CF·1000 div DF`. 1000 = the token appears once wherever it
    * appears (function-word behavior); high = it CLUMPS (topic words,
    * boilerplate, templates) — the signal that separates "frequent
    * because everywhere" from "frequent because duplicated", which is
    * why dedup pipelines read it next to [[qTextZipf]].
    *
    * Scale shape: CF rides the shared session vocab artifact (corpus
    * scanned once across vocab consumers); DF is one doc-distinct
    * explode into a token-keyed rollup joined to the 50-row head —
    * AQE broadcasts the head side, so the join never shuffles the DF
    * table. Headroom: CF·1000 in decimal(38) past 10³⁰ occurrences. */
  val qTextBurstiness: Q = (s, d) => {
    val head = vocabTopK(Tables.documents(s, d), k = 50,
      cacheKey = Some(s"vocab:${System.identityHashCode(s)}:$d"))
      .select(col("rank"), col("token"), col("cnt").as("cf"))
    val df = Tables.documents(s, d)
      .select(col("doc_id"), explode(array_distinct(
        split(lower(col("text")), " "))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    df.join(broadcast(head), "token")
      .select(col("rank"), col("token"), col("cf"), col("df"),
        expr("CAST(CAST(cf AS DECIMAL(38,0)) * 1000 div df AS LONG)")
          .as("burst_milli"))
  }

  val queries: Map[String, Q] = Map(
    "q_text_burstiness" -> qTextBurstiness,
    "q_text_zipf" -> qTextZipf,
    "q_langid_confusion" -> qLangidConfusion,
    "q_vocab_coverage" -> qVocabCoverage,
    "q_text_langid" -> qTextLangid,
    "q_text_quality" -> qTextQuality,
    "q_text_gopher" -> qTextGopher,
    "q_text_bpe_pairs" -> qTextBpePairs,
    "q_text_bpe_train" -> qTextBpeTrain,
    "q_text_bpe_encode" -> qTextBpeEncode,
    "q_text_token_count" -> qTextTokenCount,
    "q_text_fingerprint" -> qTextFingerprint,
    "q_text_winnowing" -> qTextWinnowing,
    "q_text_tfidf" -> qTextTfidf,
    "q_text_bm25" -> qTextBm25,
    "q_text_ngrams" -> qTextNgrams,
    "q_text_redact" -> qTextRedact,
    "q_text_clean" -> qTextClean,
    "q_text_perplexity" -> qTextPerplexity,
    "q_index_inverted" -> qIndexInverted,
    "q_text_skipgrams" -> qTextSkipgrams,
    "q_text_colloc" -> qTextColloc,
    "q_text_hash_features" -> qTextHashFeatures,
    "q_vocab_topk" -> qVocabTopk)

  val oracleSql: Map[String, String] = Map(
    // Same fixed-point ln stages as the Spark side (FixedPoint
    // .lnFpStages folded over the one shared stage list): ln(cnt+1) on
    // the vocab-sized model, ln(T) on the 1-row stats scalar.
    "q_text_perplexity" -> {
      import graft.operators.FixedPoint._
      val mLn = nestStages(
        "SELECT tok, cnt + 1 AS cnt1 FROM m",
        lnFpStages("cnt1", "c_", DuckFp))
      val tLn = nestStages(
        "SELECT tv FROM st", lnFpStages("tv", "t_", DuckFp))
      s"""WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         m AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
         st AS (
           SELECT CAST(SUM(cnt) AS BIGINT) + CAST(COUNT(*) AS BIGINT)
             AS tv FROM m),
         ml AS (SELECT tok, c_ln FROM ($mLn)),
         tl AS (SELECT t_ln FROM ($tLn)),
         sc AS (
           SELECT t.doc_id,
             tl.t_ln - COALESCE(ml.c_ln, 0) AS nll_fp
           FROM toks t LEFT JOIN ml USING (tok), tl)
         SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(SUM(nll_fp) // (COUNT(*) * 1000000000000) AS BIGINT)
             AS avg_nll_unat
         FROM sc GROUP BY doc_id ORDER BY doc_id"""
    },
    "q_text_burstiness" ->
      """WITH t AS (
           SELECT unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
         c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
         k AS (SELECT token, cnt FROM c
               ORDER BY cnt DESC, token LIMIT 50),
         head AS (
           SELECT token, cnt AS cf,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
           FROM k),
         docdist AS (
           SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(lower(text), ' ')))
               AS token
           FROM documents),
         df AS (SELECT token, COUNT(*) AS df FROM docdist GROUP BY 1)
         SELECT CAST(head.rank AS INT) AS rank, head.token,
           CAST(head.cf AS BIGINT) AS cf, CAST(df.df AS BIGINT) AS df,
           CAST(CAST(head.cf AS HUGEINT) * 1000 // df.df AS BIGINT)
             AS burst_milli
         FROM df JOIN head USING (token) ORDER BY rank""",
    "q_text_zipf" ->
      """WITH t AS (
           SELECT unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
         c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
         k AS (SELECT token, cnt FROM c
               ORDER BY cnt DESC, token LIMIT 50),
         r AS (
           SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
           FROM k),
         z AS (
           SELECT rank, token, cnt,
             MAX(CASE WHEN rank = 1 THEN cnt END) OVER () AS f1
           FROM r)
         SELECT CAST(rank AS INT) AS rank, token,
           CAST(cnt AS BIGINT) AS cnt,
           CAST((CAST(cnt AS HUGEINT) * rank * 1000000) // f1 AS BIGINT)
             AS zipf_ppm
         FROM z ORDER BY rank""",
    "q_langid_confusion" ->
      """WITH sc AS (
           SELECT doc_id,
             CAST(len(list_intersect(toks, ['the','a','of','and','in','to'])) AS INT) AS score_en,
             CAST(len(list_intersect(toks, ['der','die','das','und','ist'])) AS INT) AS score_de,
             CAST(len(list_intersect(toks, ['le','la','les','et','est'])) AS INT) AS score_fr,
             CAST(len(list_intersect(toks, ['el','los','las','y','es'])) AS INT) AS score_es
           FROM (SELECT doc_id,
                   list_distinct(string_split(lower(text), ' ')) AS toks
                 FROM documents)),
         pred AS (
           SELECT doc_id,
             CASE WHEN greatest(score_en, score_de, score_fr, score_es) = 0
                  THEN 'und'
                  WHEN score_fr >= score_es AND score_fr >= score_en
                       AND score_fr >= score_de THEN 'fr'
                  WHEN score_es >= score_en AND score_es >= score_de THEN 'es'
                  WHEN score_en >= score_de THEN 'en'
                  ELSE 'de' END AS pred_lang
           FROM sc)
         SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
         FROM pred p JOIN documents d USING (doc_id)
         GROUP BY d.lang, p.pred_lang
         ORDER BY d.lang, p.pred_lang""",
    "q_vocab_coverage" ->
      """WITH t AS (
           SELECT source, unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
         c AS (SELECT token, COUNT(*) AS cnt
               FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
                     FROM documents) GROUP BY token),
         k AS (SELECT token FROM c ORDER BY cnt DESC, token LIMIT 30)
         SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(COUNT(k.token) AS BIGINT) AS covered_tokens,
           CAST(COUNT(k.token) * 1000000 // COUNT(*) AS BIGINT)
             AS covered_ppm
         FROM t LEFT JOIN k ON t.token = k.token
         GROUP BY source ORDER BY source""",
    "q_text_bpe_train" -> bpeTrainOracle(BpeRounds),
    "q_text_bpe_encode" -> bpeEncodeOracle(BpeRounds),
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
    "q_text_bpe_pairs" ->
      """WITH vocab AS (
           SELECT word, COUNT(*) AS freq
           FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                 FROM documents)
           WHERE len(word) >= 2
           GROUP BY word),
         pairs AS (
           SELECT word, freq,
             unnest(list_transform(range(len(word) - 1),
               i -> substring(word, i + 1, 2))) AS pair
           FROM vocab)
         SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occ,
           COUNT(DISTINCT word) AS n_words
         FROM pairs GROUP BY pair ORDER BY pair""",
    "q_text_gopher" ->
      """WITH t AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
         m AS (
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT)
               AS char_sum,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS n_alpha,
             CAST(len(list_filter(toks,
               t -> regexp_matches(t, '[^a-z0-9]'))) AS BIGINT) AS n_sym,
             CAST(len(list_filter(toks,
               t -> t IN ('the','a','of','and','in','to'))) AS BIGINT)
               AS n_stop
           FROM t)
         SELECT doc_id, n_words, char_sum, n_alpha, n_sym, n_stop,
           (n_words BETWEEN 50 AND 100000) AS r_wordcount,
           (3*n_words <= char_sum AND char_sum <= 10*n_words) AS r_meanlen,
           (10*n_sym <= n_words) AS r_symbols,
           (5*n_alpha >= 4*n_words) AS r_alpha,
           (n_stop >= 2) AS r_stopwords,
           ((n_words BETWEEN 50 AND 100000)
             AND (3*n_words <= char_sum AND char_sum <= 10*n_words)
             AND (10*n_sym <= n_words) AND (5*n_alpha >= 4*n_words)
             AND (n_stop >= 2)) AS keep
         FROM m ORDER BY doc_id""",
    "q_text_token_count" ->
      """SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT) AS n_bpeish,
           CAST(len(string_split(text, ' ')) AS INT) AS n_ws
         FROM documents ORDER BY doc_id""",
    "q_text_winnowing" ->
      """WITH g AS (
           SELECT doc_id, lower(text) AS t,
             greatest(len(lower(text)) - 4, 0) AS ng
           FROM documents),
         gr AS (
           SELECT doc_id, ng,
             CASE WHEN ng >= 1 THEN
               list_transform(generate_series(1, ng),
                 i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(substr(t, CAST(i AS INT), 5), ''),
                          c -> CAST(ascii(c) AS BIGINT))),
                      (h, c) -> (h * 31 + c) % 1000000007))
             ELSE CAST([] AS BIGINT[]) END AS grams
           FROM g),
         w AS (
           SELECT doc_id, ng,
             CASE WHEN ng - 3 >= 1 THEN
               list_distinct(list_transform(generate_series(1, ng - 3),
                 j -> list_min(grams[CAST(j AS INT):CAST(j + 3 AS INT)])))
             ELSE CAST([] AS BIGINT[]) END AS fps
           FROM gr)
         SELECT doc_id, CAST(ng AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fp,
           CAST(coalesce(list_sum(fps), 0) AS BIGINT) AS fp_sum
         FROM w ORDER BY doc_id""",
    "q_text_fingerprint" ->
      """SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
             (h, c) -> (h * 31 + c) % 1000000007) AS fp
         FROM documents ORDER BY doc_id""",
    "q_text_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
         dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
         SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df
         FROM tf JOIN dfreq USING (tok)
         ORDER BY tf.doc_id, tf.tok""",
    "q_text_bm25" ->
      """WITH dl AS (
           SELECT doc_id,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
           FROM documents),
         tot AS (
           SELECT CAST(SUM(dl) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM dl),
         toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         tf AS (
           SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
         dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok)
         SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df, dl.dl,
           CAST(22 * tot.t * tf.tf AS BIGINT) AS sat_num,
           CAST(10 * tot.t * tf.tf + 3 * tot.t + 9 * tot.n * dl.dl
             AS BIGINT) AS sat_den
         FROM tf
         JOIN dfreq USING (tok)
         JOIN dl ON tf.doc_id = dl.doc_id
         CROSS JOIN tot""",
    "q_text_ngrams" ->
      """WITH t AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents WHERE len(string_split(lower(text), ' ')) >= 2),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(range(len(toks) - 1),
               i -> toks[i + 1] || ' ' || toks[i + 2])) AS bigram
           FROM t)
         SELECT bigram, COUNT(*) AS n,
           COUNT(DISTINCT doc_id) AS n_docs
         FROM bg GROUP BY bigram ORDER BY bigram""",
    "q_text_redact" ->
      """SELECT doc_id,
           regexp_replace(regexp_replace(text, '\b[0-9]+\b', '<NUM>', 'g'),
             '\b(customer|spark)\b', '<ENT>', 'g') AS redacted,
           CAST(len(regexp_extract_all(text, '\b(customer|spark)\b')) AS INT) AS n_ent,
           CAST(len(regexp_extract_all(text, '\b[0-9]+\b')) AS INT) AS n_num
         FROM documents ORDER BY doc_id""",
    "q_text_clean" ->
      """SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(text, '[\x00-\x1f]', ' ', 'g'),
             ' {2,}', ' ', 'g')) AS cleaned,
           CAST(length(text) AS INT) AS n_before,
           CAST(length(trim(regexp_replace(
             regexp_replace(text, '[\x00-\x1f]', ' ', 'g'),
             ' {2,}', ' ', 'g'))) AS INT) AS n_after
         FROM documents ORDER BY doc_id""",
    "q_index_inverted" ->
      """WITH sp AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
         t AS (
           SELECT doc_id,
             unnest(list_transform(range(len(toks)), i ->
               {'tok': toks[i + 1], 'pos': i})) AS u
           FROM sp),
         tf AS (
           SELECT u.tok AS tok, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
             array_to_string(list_sort(list(u.pos)), ',') AS pos_csv
           FROM t GROUP BY u.tok, doc_id)
         SELECT tok, doc_id, tf, pos_csv,
           CAST(COUNT(*) OVER (PARTITION BY tok) AS BIGINT) AS df
         FROM tf ORDER BY tok, doc_id""",
    "q_text_hash_features" ->
      """WITH t AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents),
         v AS MATERIALIZED (
           SELECT tok,
             CAST('0x' || substring(md5(tok), 1, 4) AS INT) % 256 AS bucket
           FROM (SELECT DISTINCT tok FROM t)),
         b AS (
           SELECT t.doc_id, v.bucket FROM t JOIN v USING (tok)),
         c AS (
           SELECT doc_id, bucket, COUNT(*) AS cnt
           FROM b GROUP BY doc_id, bucket)
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
           string_agg(bucket || ':' || cnt, ' ' ORDER BY bucket) AS features
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q_text_colloc" ->
      """WITH t AS (
           SELECT string_split(lower(text), ' ') AS toks
           FROM documents),
         p AS (
           SELECT unnest(list_transform(range(len(toks) - 1), i ->
             {'w': toks[i + 1], 'c': toks[i + 2]})) AS u
           FROM t),
         b AS (
           SELECT u.w AS w, u.c AS c, COUNT(*) AS n_ab
           FROM p GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         uni AS (
           SELECT tok, COUNT(*) AS n_tok
           FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok)
         SELECT b.w, b.c, CAST(b.n_ab AS BIGINT) AS n_ab,
           CAST(uw.n_tok AS BIGINT) AS n_w,
           CAST(uc.n_tok AS BIGINT) AS n_c,
           CAST(CAST(b.n_ab AS HUGEINT) * 2000000
             // (uw.n_tok + uc.n_tok) AS BIGINT) AS dice_ppm
         FROM b JOIN uni uw ON b.w = uw.tok
           JOIN uni uc ON b.c = uc.tok
         ORDER BY b.w, b.c""",
    "q_text_skipgrams" ->
      """WITH t AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents),
         p AS (
           SELECT doc_id, unnest(list_concat(
             list_transform(range(len(toks) - 1), i ->
               {'w': toks[i + 1], 'c': toks[i + 2], 'k': 1}),
             list_transform(range(len(toks) - 2), i ->
               {'w': toks[i + 1], 'c': toks[i + 3], 'k': 2}))) AS u
           FROM t)
         SELECT u.w AS w, u.c AS c, u.k AS k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
         FROM p GROUP BY w, c, k ORDER BY w, c, k""",
    "q_vocab_topk" ->
      """WITH t AS (
           SELECT unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
         c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token),
         k AS (SELECT token, cnt FROM c
               ORDER BY cnt DESC, token LIMIT 30),
         r AS (
           SELECT token, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
             CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cnt
           FROM k)
         SELECT token, cnt, rank, cum_cnt,
           CAST(cum_cnt AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM t) AS DOUBLE) AS cum_pct
         FROM r ORDER BY rank""")
}
