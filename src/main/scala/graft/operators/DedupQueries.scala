package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Near-duplicate detection operators for training-data pipelines
  * (north-star surface beyond SURVEY.md §2.2's exact dedup): MinHash+LSH
  * banding, SimHash, token-set similarity join with prefix filtering, and
  * embedding-cosine near-dup.
  *
  * Hash family: all signatures derive from md5 (identical hex output in
  * Spark and DuckDB), so signature queries are *exactly* oracle-checkable —
  * no "approximately equal" escape hatch.
  *
  * Scale design (100 TB):
  *  - MinHash: per-doc work is O(tokens × k); the only shuffle is the
  *    groupBy(doc, i) min — map-side combinable. Band keys are 32-byte
  *    digests → candidate generation is a narrow-key self-join.
  *  - Prefix filtering bounds the candidate self-join to each doc's
  *    (n − ⌈t·n⌉ + 1) globally-rarest tokens, the standard SSJoin bound —
  *    never the full |docs|² cross product.
  *  - SimHash: one 64-bit signature per doc; hamming-ball grouping is a
  *    shuffle on 4 16-bit sub-keys (pigeonhole), not implemented here as a
  *    declared query (probabilistic recall has no exact oracle).
  */
object DedupQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Distinct lowercase unigram tokens per doc. The fixture corpus is a
    * word soup over a ~31-token vocabulary (re-ordered near-duplicates),
    * so unigram sets are the semantically right shingle unit; for prose,
    * swap in word n-grams via the same pipeline. */
  def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        array_distinct(split(lower(col("text")), " ")).as("toks"))
      .withColumn("n", size(col("toks")))

  private def docTokens(s: SparkSession, d: String): DataFrame =
    docTokens(Tables.documents(s, d))

  /** Token-set similarity join over any (doc_id, text) DataFrame: all
    * pairs with Jaccard ≥ tNum/tDen, via prefix filtering + exact
    * integer-arithmetic verification. Library entry point behind
    * [[qDedupNgram]]; both paths property-tested against brute force.
    *
    * Dispatch: when the global vocabulary fits in 62 bits, token sets
    * become single BIGINT bitmasks — candidate pairs carry two longs
    * instead of string arrays and verification is one `bit_count(a & b)`
    * (measured ~30× vs the array path on the sf0.1 fixture, whose corpus
    * is exactly this tiny-vocab regime). Larger vocabularies take the
    * general array path. */
  /** Identical-token-set grouping: (doc_id → canonical set key) and one
    * group row per distinct set (rep = min doc_id, member list). Every
    * set-based similarity measure (Jaccard, MinHash bands) is a function
    * of the token set alone, so computation can run once per distinct set
    * and expand back to docs — see [[Clustering.setContractedLabels]] and
    * [[qDedupMinhashPairs]]. Both frames are eagerly checkpointed (each
    * is scanned several times downstream). */
  /** Drop every session-scoped dedup artifact (pair lists, set groups,
    * band tables). Checkpoint blocks are released by the ContextCleaner
    * once unreferenced; persisted frames are unpersisted eagerly. For
    * long-lived sessions that re-ingest a corpus under the same key. */
  def clearArtifacts(): Unit = {
    pairCache.values.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    pairCache.clear()
    mhPairCache.values.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    mhPairCache.clear()
    groupCache.clear()
    bandCache.clear()
  }

  private val groupCache =
    scala.collection.concurrent.TrieMap[String, (DataFrame, DataFrame)]()

  def setGroups(docs: DataFrame,
      cacheKey: Option[String] = None): (DataFrame, DataFrame) = {
    def build(): (DataFrame, DataFrame) = {
      val keyed = docTokens(docs)
        // tokens are space-split so space cannot occur inside one —
        // collision-free as the canonical set-key separator
        .withColumn("skey", array_join(sort_array(col("toks")), " "))
        .select("doc_id", "skey")
        .filter(col("skey").isNotNull) // null text = no tokens = no pairs
        .localCheckpoint(true)
      val groups = keyed.groupBy("skey")
        .agg(min("doc_id").as("rep"), collect_list("doc_id").as("members"))
        .localCheckpoint(true)
      (keyed, groups)
    }
    cacheKey match {
      case Some(k) => Artifacts.memo(groupCache, k)(build())
      case None    => build()
    }
  }

  /** Session-scoped pair-list artifacts, keyed by caller-supplied corpus
    * identity — same semantics as Similarity's IVF cache: at 100 TB the
    * near-dup pair list is an INGEST artifact (materialized once when a
    * batch lands, read by every downstream dedup/clustering/curation
    * job), not something each query recomputes. */
  private val pairCache =
    scala.collection.concurrent.TrieMap[(String, Int, Int), DataFrame]()

  /** Minhash candidate-pair artifact, per corpus key — the banded
    * self-join output, lazily checkpointed so its first consumer pays
    * the join once and every later consumer (the declared pair query,
    * the cross-source matrix, clustering) reads the materialized
    * table. */
  private val mhPairCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  def ngramPairs(docs: DataFrame, tNum: Int, tDen: Int,
      cacheKey: Option[String] = None): DataFrame = {
    require(tNum > 0 && tNum <= tDen)
    def build(): DataFrame = {
      val toks = docTokens(docs).filter(col("n") > 0)
      // Both paths consume the global token-frequency table, so the
      // vocabulary probe that picks the path also materializes freq — one
      // explode+agg pass total, not one for the probe plus one inside the
      // path.
      val freq = toks.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = if (freq.count() <= 62) ngramPairsBitmask(toks, freq, tNum, tDen)
        else ngramPairsGeneral(toks, freq, tNum, tDen)
      // Eager materialization cuts the lineage so the vocabulary frame can
      // be freed immediately — no orphaned cached frames per invocation.
      // Every caller consumes the full pair list anyway (write, count, or
      // the clustering loop), so nothing is computed that wasn't needed.
      // The artifact is UNSORTED: a sort here would force a second full
      // pass over the pair join (range-bound sampling) that only the
      // declared query's presentation needs — it orders on top.
      val out = pairs.localCheckpoint(true)
      freq.unpersist(false)
      out
    }
    cacheKey match {
      case Some(k) => Artifacts.memo(pairCache, (k, tNum, tDen),
        Artifacts.unpersistDf)(build())
      case None    => build()
    }
  }

  /** Tiny-vocabulary fast path: one 62-bit mask per doc; prefix tokens =
    * lowest-frequency bits. Bit order == (cnt, tok) order, so the prefix
    * set is identical to the general path's. */
  private def ngramPairsBitmask(toks: DataFrame, freq: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    val vocab = freq.withColumn("bit",
      row_number().over(Window.orderBy("cnt", "tok")) - 1)
    val exploded = toks
      .select(col("doc_id"), col("n"), explode(col("toks")).as("tok"))
      .join(broadcast(vocab), "tok")
    val masks = exploded.groupBy(col("doc_id"), col("n"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("mask"))
    // prefix = the (n − ⌈t·n⌉ + 1) rarest tokens = lowest set bits;
    // pmask = those bits as a mask (for once-only pair emission below)
    val pre = masks
      .withColumn("pbits", expr(
        s"""slice(filter(sequence(0, 61), b -> (shiftright(mask, b) & 1) = 1),
            1, n - (($tNum * n + $tDen - 1) div $tDen) + 1)"""))
      .withColumn("pmask", expr(
        "aggregate(pbits, CAST(0 AS BIGINT), (acc, b) -> acc + shiftleft(CAST(1 AS BIGINT), b))"))
      .withColumn("pbit", explode(col("pbits")))
      .select(col("pbit"), col("doc_id"), col("mask"), col("pmask"), col("n"))
    pre.as("a").join(pre.as("b"), Seq("pbit"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      // length-ratio prune: J(A,B) ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t
      .filter(col("a.n") * tDen >= col("b.n") * tNum
        && col("b.n") * tDen >= col("a.n") * tNum)
      // emit each pair exactly once: only at the LOWEST common prefix bit
      // (x & -x isolates it) — replaces a multi-million-row distinct
      .withColumn("cp", col("a.pmask").bitwiseAND(col("b.pmask")))
      .filter(expr("shiftleft(CAST(1 AS BIGINT), pbit) = (cp & -cp)"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.mask & b.mask)").as("inter"),
        (col("a.n") + col("b.n")).as("nsum"))
      .withColumn("uni", col("nsum") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  /** General path (PPJoin-shaped). Scale notes (100 TB):
    *  - The frequency join is a plain shuffle join on `tok` — the global
    *    vocabulary is 10⁸–10⁹ rows at corpus scale and must never be
    *    broadcast (Catalyst/AQE may still pick broadcast when stats say
    *    it is genuinely tiny, which is the right call in both regimes).
    *  - Each prefix row carries its doc's rank-sorted key set, so a pair
    *    is emitted exactly once — at the lowest-ranked common prefix key
    *    (the same once-only rule as the bitmask path's `cp & -cp`) — and
    *    verified inline. No multi-million-row candidate `distinct()`, no
    *    re-join to fetch token arrays.
    * Token rarity is encoded as a single sortable key `zero-pad(cnt):tok`
    * (padded numeric strings sort numerically), so "globally rarest"
    * ordering, once-only emission, and set intersection all run on one
    * column. */
  private def ngramPairsGeneral(toks: DataFrame, freq: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    val keyed = toks
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .join(freq, "tok")
      .select(col("doc_id"),
        concat(lpad(col("cnt").cast(StringType), 12, "0"), lit(":"),
          col("tok")).as("k"))
    // one shuffle on doc_id: rank-sorted key set + its prefix slice
    val pre = keyed.groupBy("doc_id")
      .agg(sort_array(collect_list(col("k"))).as("ks"))
      .withColumn("n", size(col("ks")))
      .withColumn("pks", expr(
        s"slice(ks, 1, n - (($tNum * n + $tDen - 1) div $tDen) + 1)"))
      .select(col("doc_id"), col("n"), col("ks"), col("pks"),
        explode(col("pks")).as("k"))
    val a = pre.select(col("k"), col("doc_id").as("doc_a"), col("n").as("na"),
      col("pks").as("pks_a"), col("ks").as("ks_a"))
    val b = pre.select(col("k"), col("doc_id").as("doc_b"), col("n").as("nb"),
      col("pks").as("pks_b"), col("ks").as("ks_b"))
    a.join(b, Seq("k"))
      .filter(col("doc_a") < col("doc_b"))
      // length-ratio prune: J(A,B) ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t
      .filter(col("na") * tDen >= col("nb") * tNum
        && col("nb") * tDen >= col("na") * tNum)
      // once-only: both prefix arrays are rank-sorted, so the head of
      // their intersection is the lowest-ranked common prefix key
      .filter(col("k") ===
        element_at(array_intersect(col("pks_a"), col("pks_b")), 1))
      .withColumn("inter", size(array_intersect(col("ks_a"), col("ks_b"))))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"))
  }

  private val bandCache =
    scala.collection.concurrent.TrieMap[(String, Int, Int), DataFrame]()

  /** MinHash band keys over any (doc_id, text) DataFrame: k md5-derived
    * min-hashes in `bands` bands of `rows` rows. Docs sharing a band_key
    * are LSH candidate duplicates. With `cacheKey`, the signature table
    * becomes a session-scoped ingest artifact (computed once per landed
    * corpus, reused by every banding consumer). */
  def minhashBands(docs: DataFrame, bands: Int, rows: Int,
      cacheKey: Option[String] = None): DataFrame = {
    val k = bands * rows
    // One hash column per minhash index instead of a k× row explode: the
    // only shuffle is groupBy(doc_id) with k map-side-combinable string
    // mins (k · 32 hex bytes per doc), ~k× less shuffle volume than
    // exploding (tok, i) pairs, and the per-band digest folds map-side
    // from the k signature columns with no second aggregation. The k
    // md5s are computed per token OCCURRENCE — measured faster here than
    // hashing the distinct vocabulary and joining back (the distinct +
    // join exchanges cost more than the codegen'd md5s they save); on a
    // corpus where per-occurrence hashing ever did dominate, h(i, tok)
    // depends only on (i, tok), so a vocab-keyed hash table + equality
    // join is the drop-in alternative. The band_key bytes are IDENTICAL
    // to the historical two-shuffle formulation (lpad'd "ii=sig"
    // fragments, "|"-joined in index order, which equals the sorted
    // string order the oracle SQL uses).
    def build(): DataFrame = {
      val sigs = docTokens(docs)
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(min(md5(concat(lit("0:"), col("tok")))).as("s0"),
          (1 until k).map(i =>
            min(md5(concat(lit(s"$i:"), col("tok")))).as(s"s$i")): _*)
      val bandCols = (0 until bands).map { b =>
        val frags = (b * rows until (b + 1) * rows)
          .map(i => concat(lit(f"$i%02d="), col(s"s$i")))
        struct(lit(b).as("band"), md5(concat_ws("|", frags: _*)).as("band_key"))
      }
      sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"),
          col("bb.band_key").as("band_key"))
    }
    cacheKey match {
      case Some(key) =>
        Artifacts.memo(bandCache, (key, bands, rows),
          Artifacts.unpersistDf)(build().localCheckpoint(true))
      case None => build()
    }
  }

  /** MinHash signature + LSH band keys: k=12 md5-derived min-hashes,
    * 4 bands × 3 rows. Deterministic → exact DuckDB oracle. Docs sharing a
    * band_key are LSH candidates (threshold ≈ (1/4)^(1/3) ≈ 0.63). */
  val qDedupMinhashSig: Q = (s, d) =>
    minhashBands(Tables.documents(s, d), bands = 4, rows = 3)

  /** MinHash LSH bucket-join: candidate pairs sharing ≥1 band key — the
    * complete shingle→minhash→band→bucket-join pipeline. The candidate
    * SET is a deterministic function of the md5 signatures (only its
    * relation to true Jaccard is probabilistic), so this is exactly
    * oracle-checkable too. Shuffle key = 32-hex band digest.
    *
    * Runs set-contracted ([[setGroups]]): band keys are a function of the
    * token set, so signatures + the band self-join cover one
    * representative per distinct set, and member expansion reproduces the
    * doc-level pair list exactly — identical-set groups (the hot band
    * buckets that made the doc-level join quadratic-with-dups) become
    * single nodes, and the only quadratic step left is writing the
    * output. 2 bands × 6 rows: threshold ≈ (1/2)^(1/6) ≈ 0.89, the LSH
    * candidate generator matched to the J ≥ 0.9 near-dup join. (Wider
    * 4×3 banding targets ~0.63 — on this high-similarity word-soup
    * corpus that collapses into 3000-doc buckets ⇒ 16M+ candidate
    * pairs, which no plumbing can make cheap: candidate volume is a
    * parameter decision, not an execution one.) */
  val qDedupMinhashPairs: Q = (s, d) =>
    Artifacts.memo(mhPairCache, s"docs:$d:mhpairs", Artifacts.unpersistDf) {
      buildMinhashPairs(s, d).localCheckpoint(false) // lazy: materializes
      // on first action, then every consumer reads the cut lineage
    }

  private def buildMinhashPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (_, groups) = setGroups(docs, Some(s"docs:$d:groups"))
    // band keys are per-doc, so the whole-corpus signature artifact (the
    // same one q_dedup_incremental consumes — one signature pass per
    // corpus, shared across every banding consumer) filtered to set
    // representatives is identical to banding the representatives alone
    val bands = minhashBands(docs, bands = 2, rows = 6,
        cacheKey = Some(s"docs:$d:all"))
      .join(groups.select(col("rep").as("doc_id")), Seq("doc_id"), "left_semi")
    val repPairs = bands.as("a").join(bands.as("b"), Seq("band", "band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("ra"), col("b.doc_id").as("rb"))
      .distinct()
    // identical sets share ALL band keys → every within-group pair is a
    // candidate by construction
    val within = groups.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("doc_a"), col("members"))
      .select(col("doc_a"), explode(col("members")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
    val cross = repPairs
      .join(groups.select(col("rep").as("ra"), col("members").as("ma")), "ra")
      .join(groups.select(col("rep").as("rb"), col("members").as("mb")), "rb")
      .select(explode(col("ma")).as("x"), col("mb"))
      .select(col("x"), explode(col("mb")).as("y"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"))
    within.union(cross)
  }

  /** SimHash: 60-bit signature from md5-derived per-token 60-bit hashes
    * weighted by token frequency. One BIGINT per doc; deterministic →
    * exact oracle. Implementation shared with [[Dedup.simhashOf]]. */
  val qDedupSimhash: Q = (s, d) =>
    Dedup.simhashOf(Tables.documents(s, d))

  /** Set-similarity self-join: token-set Jaccard ≥ 0.9 pairs via prefix
    * filtering (PPJoin-style). Candidates join only on each doc's
    * (n − ⌈0.9·n⌉ + 1) globally-rarest tokens — the provable-complete
    * prefix — then exact verification with integer arithmetic (no float
    * thresholds). Matches a brute-force Jaccard oracle exactly. */
  val qDedupNgram: Q = (s, d) =>
    ngramPairs(Tables.documents(s, d), tNum = 9, tDen = 10,
      cacheKey = Some(s"docs:$d"))

  /** SimHash near-duplicate candidate pairs within hamming distance
    * `maxHamming` of the 60-bit signatures, by pigeonhole banding: split
    * the signature into `maxHamming + 1` bands — any pair within the
    * radius must agree exactly on ≥1 band, so candidates come from
    * equality joins on narrow band keys (the shuffle is on 15-bit ints,
    * never on documents), then exact hamming verification via
    * bit_count(xor). Scales like MinHash banding. */
  def simhashPairs(sims: DataFrame, maxHamming: Int): DataFrame = {
    // width = 60/(maxHamming+1) must stay >= 1: at width 0 every band_key
    // collapses to 0 and the join degenerates into a full cross product
    require(maxHamming >= 0 && maxHamming < 60,
      s"maxHamming must be in [0, 60), got $maxHamming")
    val bands = maxHamming + 1
    val width = 60 / bands
    val banded = sims.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key", expr(
        s"shiftright(simhash, band * $width) & ${(1L << width) - 1}"))
    banded.as("a").join(banded.as("b"), Seq("band", "band_key"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs (cosine ≥ 0.45). No oracle —
    * float fold order (SURVEY.md §7.4); scalatest-verified against a
    * plain-Scala reference. Brute self-join here is the exactness
    * baseline; the 100 TB path is LSH bucketing (graft.operators
    * .Similarity). Cosine is the native codegen'd CosineSimFloat
    * expression (graft.functions) — one fused primitive loop per pair,
    * ~10× the zip_with+aggregate HOF form on the 2M-pair sf0.1 join. */
  val qDedupEmbed: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.cosineF(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= 0.45)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Embedding near-dup with an EXACT oracle: quantize to milli-units
    * (round(CAST(x AS DOUBLE)·1000) — the double cast pins both engines
    * to the same product; in float arithmetic a payload like 0.3195f
    * rounds to 319.5 while the double product is 319.4999…, a real
    * sf0.1 divergence found in round 10), then pure int64 arithmetic:
    * pair qualifies iff dot > 0 and
    * dot²·10⁴ ≥ 2025·‖a‖²·‖b‖² (⇔ cosine ≥ 0.45). No floats cross the
    * engine boundary, so this hash-matches DuckDB exactly — the
    * oracle-checkable complement of [[qDedupEmbed]]. */
  val qDedupEmbedQ: Q = (s, d) => {
    val quant = graft.functions.VectorFunctions.milliQuant(col("embedding"))
    import graft.functions.VectorFunctions.dotL
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), quant.as("qv"))
      .withColumn("nrm2", dotL(col("qv"), col("qv")))
    val a = e.select(col("vec_id").as("id_a"), col("qv").as("qa"),
      col("nrm2").as("na2"))
    val b = e.select(col("vec_id").as("id_b"), col("qv").as("qb"),
      col("nrm2").as("nb2"))
    // threshold test in DECIMAL(38,0): dot²·10⁴ can pass int64 for
    // embeddings with quantized norm ≳3e7 (non-unit vectors), and under
    // ANSI mode that aborts the job; 38-digit decimals hold any dim-64
    // milli-quantized input (oracle side uses HUGEINT for the same reason)
    val dec38 = DecimalType(38, 0)
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("dot", dotL(col("qa"), col("qb")))
      .filter(col("dot") > 0
        && col("dot").cast(dec38) * col("dot") * 10000L
           >= lit(2025L).cast(dec38) * col("na2") * col("nb2"))
      .select(col("id_a"), col("id_b"), col("dot"), col("na2"), col("nb2"))
  }

  // ---- registry ---------------------------------------------------------

  // qDedupEmbed / qDedupEmbedQ are NOT registered: both are all-pairs
  // self-joins kept only as exactness baselines for the recall tests
  // (NoOracleSpec). The declared embedding-dedup surface is the
  // scale-safe q_dedup_embed_lsh (graft.operators.Similarity) — an
  // equality join on (table, bucket) with the same integer verification.
  /** Cross-source near-duplication matrix: LSH candidate pairs rolled
    * up by unordered source pair — the curation diagnostic for "which
    * sources copy from each other" that decides dedup priority and
    * mixture down-weighting before any pair is inspected. Reuses the
    * session's banded-signature artifact (the pair generation is the
    * [[qDedupMinhashPairs]] plan); the rollup adds two broadcast-sized
    * doc→source joins and one keyed aggregate over the pair stream. */
  val qDedupCrossMatrix: Q = (s, d) => {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    qDedupMinhashPairs(s, d)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .groupBy(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Operational audit of the LSH index the sig query builds — the
    * bucket-size census an operator reads BEFORE running the pair join,
    * because candidate volume is Σ s·(s−1)/2 over bucket sizes and one
    * hot bucket is the scale hazard (see [[qDedupMinhashPairs]]'s
    * banding note: a 3000-doc bucket ⇒ 16M+ pairs no plumbing can make
    * cheap). Per band of the 4×3 index: bucket count, docs indexed,
    * the largest bucket, the exact candidate-pair bill, and how many
    * buckets are singletons (generate no candidates at all).
    *
    * Scale shape: the signature build's one doc-keyed exchange, then a
    * (band, band_key) rollup and a 4-row band fold — audit cost is the
    * index build, nothing quadratic runs. Headroom: s·(s−1) div 2 in
    * decimal(38), LONG output safe below ~4·10⁹-doc buckets. */
  val qDedupBucketStats: Q = (s, d) => {
    minhashBands(Tables.documents(s, d), bands = 4, rows = 3)
      .groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("sz")).as("n_docs"),
        max(col("sz")).as("max_bucket"),
        sum(expr("(CAST(sz AS DECIMAL(38,0)) * (sz - 1)) div 2"))
          .cast("long").as("cand_pairs"),
        sum(when(col("sz") === 1L, 1L).otherwise(0L)).as("singletons"))
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_cross_matrix" -> qDedupCrossMatrix,
    "q_dedup_bucket_stats" -> qDedupBucketStats,
    "q_dedup_minhash_sig" -> qDedupMinhashSig,
    "q_dedup_minhash_pairs" -> qDedupMinhashPairs,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_dedup_ngram" -> qDedupNgram)

  val oracleSql: Map[String, String] = Map(
    "q_dedup_bucket_stats" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         h AS (
           SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || tok) AS hv
           FROM tok, (SELECT unnest(generate_series(0, 11)) AS i)),
         s AS (SELECT doc_id, i, MIN(hv) AS sig FROM h GROUP BY doc_id, i),
         b AS (
           SELECT doc_id, CAST(i // 3 AS INT) AS band,
             md5(string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || '=' || sig,
                 '|' ORDER BY i)) AS band_key
           FROM s GROUP BY doc_id, i // 3),
         bu AS (
           SELECT band, band_key, COUNT(*) AS sz FROM b GROUP BY 1, 2)
         SELECT band, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(MAX(sz) AS BIGINT) AS max_bucket,
           CAST(SUM(CAST(sz AS HUGEINT) * (sz - 1) // 2) AS BIGINT)
             AS cand_pairs,
           CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS singletons
         FROM bu GROUP BY band ORDER BY band""",
    "q_dedup_cross_matrix" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         h AS (
           SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || tok) AS hv
           FROM tok, (SELECT unnest(generate_series(0, 11)) AS i)),
         s AS (SELECT doc_id, i, MIN(hv) AS sig FROM h GROUP BY doc_id, i),
         bands AS (
           SELECT doc_id, i // 6 AS band,
             md5(string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || '=' || sig,
                 '|' ORDER BY i)) AS band_key
           FROM s GROUP BY doc_id, i // 6),
         pr AS (
           SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.band_key = b.band_key
           WHERE a.doc_id < b.doc_id)
         SELECT least(da.source, db.source) AS source_lo,
           greatest(da.source, db.source) AS source_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
         FROM pr
         JOIN documents da ON pr.doc_a = da.doc_id
         JOIN documents db ON pr.doc_b = db.doc_id
         GROUP BY least(da.source, db.source), greatest(da.source, db.source)
         ORDER BY source_lo, source_hi""",
    "q_dedup_minhash_sig" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         h AS (
           SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || tok) AS hv
           FROM tok, (SELECT unnest(generate_series(0, 11)) AS i)),
         s AS (SELECT doc_id, i, MIN(hv) AS sig FROM h GROUP BY doc_id, i)
         SELECT doc_id, CAST(i // 3 AS INT) AS band,
           md5(string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || '=' || sig,
               '|' ORDER BY i)) AS band_key
         FROM s GROUP BY doc_id, i // 3 ORDER BY doc_id, band""",
    "q_dedup_simhash" ->
      """WITH cnt AS (
           SELECT doc_id, tok, COUNT(*) AS cnt FROM
             (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)
           GROUP BY doc_id, tok),
         bits AS (
           SELECT doc_id, j,
             SUM(cnt * (((CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) >> j) & 1) * 2 - 1)) AS sc
           FROM cnt, (SELECT unnest(generate_series(0, 59)) AS j)
           GROUP BY doc_id, j)
         SELECT doc_id,
           CAST(SUM(CASE WHEN sc > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                AS BIGINT) AS simhash
         FROM bits GROUP BY doc_id ORDER BY doc_id""",
    "q_dedup_minhash_pairs" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS tok
           FROM documents),
         h AS (
           SELECT doc_id, i, md5(CAST(i AS VARCHAR) || ':' || tok) AS hv
           FROM tok, (SELECT unnest(generate_series(0, 11)) AS i)),
         s AS (SELECT doc_id, i, MIN(hv) AS sig FROM h GROUP BY doc_id, i),
         bands AS (
           SELECT doc_id, i // 6 AS band,
             md5(string_agg(lpad(CAST(i AS VARCHAR), 2, '0') || '=' || sig,
                 '|' ORDER BY i)) AS band_key
           FROM s GROUP BY doc_id, i // 6)
         SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key
         WHERE a.doc_id < b.doc_id
         ORDER BY doc_a, doc_b""",
    "q_dedup_ngram" ->
      """WITH t AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS toks
           FROM documents),
         p AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.toks, b.toks)) AS inter,
             len(a.toks) AS na, len(b.toks) AS nb
           FROM t a JOIN t b ON a.doc_id < b.doc_id)
         SELECT doc_a, doc_b, CAST(inter AS INT) AS inter,
           CAST(na + nb - inter AS INT) AS uni
         FROM p WHERE inter * 10 >= (na + nb - inter) * 9
         ORDER BY doc_a, doc_b""")
}
