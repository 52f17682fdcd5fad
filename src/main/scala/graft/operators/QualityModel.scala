package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.Tables

/** Learned quality scoring — the model tier the heuristic curation stack
  * feeds (the standard production ladder: hand-written gates label a
  * seed set, a cheap linear model generalizes them, the model scores the
  * full corpus; C4/CCNet-style pipelines and Rae et al. 2021 §A2 both
  * describe exactly this quality-classifier stage).
  *
  * Train/score split mirrors the engine's other learned artifacts (IVF
  * centroids, PQ codebooks — graft.operators.Similarity): TRAINING is a
  * bounded once-per-corpus ingest step (MLlib logistic regression over
  * 256 hashed-token presence features, labels = the deterministic
  * [[TextQueries.gopherGate]] keep flag; a 257-double artifact comes
  * back to the driver). SCORING is pure map-side Spark SQL: the weight
  * vector is inlined as a 256-element array literal and each document's
  * score is one `aggregate` HOF over its distinct hashed buckets —
  * codegen'd, zero shuffle, zero MLlib on the scoring path, linear at
  * any corpus size. At 100 TB you train on a fixture-sized sample and
  * score a petabyte without the model leaving the plan.
  *
  * Since r15 the MLlib path is the LIBRARY surface ([[mlLogisticScored]],
  * QualitySpec-verified — L-BFGS weights are floats no oracle can
  * re-derive) while the DECLARED q_quality_logistic is its closed-form
  * oracle-bearing twin: categorical naive Bayes over quantized doc-stat
  * features with fixed-point ln weights and the pinned [[SigmoidPpm]]
  * table, hash-matched against DuckDB.
  */
object QualityModel {

  val NumBuckets = 256

  /** Same bucket hash as [[TextQueries.hashFeatures]] — the features a
    * downstream consumer already materializes. */
  private def bucketOf(tok: Column): Column =
    (graft.functions.Md5Draws24.md5Prefix(tok, 4) % NumBuckets)
      .cast(IntegerType)

  /** Distinct presence buckets per document, sorted (fixed fold order). */
  private def docBuckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        split(lower(col("text")), " "), t => bucketOf(t)))).as("buckets"))

  /** One-time trained artifact: 256 coefficients + intercept. */
  final case class Weights(coef: Array[Double], intercept: Double)

  private val cache =
    scala.collection.concurrent.TrieMap[String, Weights]()

  private val cellCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  private val classCountCache = scala.collection.concurrent
    .TrieMap[String, (Long, Long, Seq[(String, Long, BigInt)])]()

  private val gateStatsCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** For tests / long-lived sessions (see the session-cache contract in
    * graft.operators.DedupQueries.clearArtifacts). */
  def clearCache(): Unit = {
    cache.clear()
    classCountCache.clear()
    gateStatsCache.clear()
    cellCache.values.foreach(df => try df.unpersist(false)
      catch { case _: Throwable => () })
    cellCache.clear()
  }

  /** Session artifact: the (score, lang) cell table [[qEvalAuc]] folds —
    * persisted so the corpus scans ONCE even though the AUC plan
    * consumes it on both the probe side and inside the broadcast
    * histogram subtree. */
  private def scoreCells(spark: SparkSession, sfDir: String): DataFrame =
    // Keyed by session identity as well as corpus dir: a persisted
    // DataFrame is only valid inside the SparkSession that built it, so
    // after a session restart the stale entry must miss (it is dropped by
    // the bounded-cache eviction; unpersist on a stopped session is
    // swallowed by the evictor's catch). Artifacts.memo is single-winner,
    // so the persist runs at most once per (session, corpus).
    Artifacts.memo(cellCache,
      s"${System.identityHashCode(spark)}:$sfDir", Artifacts.unpersistDf) {
      Tables.documents(spark, sfDir)
        .groupBy(col("n_chars").as("score"), col("lang"))
        .agg(count(lit(1)).as("n_pos_g"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Train the logistic gate-mimic once per corpus key. Deterministic
    * given the corpus: L-BFGS over a fixed feature space with fixed
    * hyperparameters; the result is memoized so every later scoring call
    * (and Verify's repeated runs) reuses the identical artifact. */
  def trainedWeights(spark: SparkSession, sfDir: String): Weights =
    Artifacts.memo(cache, sfDir) {
      val docs = Tables.documents(spark, sfDir)
      val labeled = TextQueries.gopherGate(docs)
        .select(col("doc_id"), col("keep").cast(DoubleType).as("label"))
      val feats = docBuckets(docs).join(labeled, "doc_id")
      import spark.implicits._
      val train = feats.select("label", "buckets").map { r =>
        val idx = r.getSeq[Int](1).toArray
        (r.getDouble(0),
          Vectors.sparse(NumBuckets, idx, Array.fill(idx.length)(1.0)))
      }.toDF("label", "features")
      val model = new LogisticRegression()
        .setMaxIter(25).setRegParam(0.01).setStandardization(false)
        .fit(train)
      Weights(model.coefficients.toArray, model.intercept)
    }

  type Q = (SparkSession, String) => DataFrame

  /** Library surface: per-doc MLlib-trained logistic probability — the
    * "train on a sample, score a petabyte" path (weights inlined as an
    * array literal, one `aggregate` HOF per doc, zero MLlib on the
    * scoring plan). L-BFGS weights are floats the oracle cannot
    * re-derive, so this stays JVM-verified (QualitySpec); the DECLARED
    * [[qQualityLogistic]] below is its closed-form oracle-bearing twin. */
  def mlLogisticScored(s: SparkSession, d: String): DataFrame = {
    val w = trainedWeights(s, d)
    val wLit = array(w.coef.map(x => lit(x)): _*)
    val z = aggregate(col("buckets"), lit(w.intercept),
      (acc, j) => acc + element_at(wLit, j + 1))
    val gate = TextQueries.gopherGate(Tables.documents(s, d))
      .select(col("doc_id"), col("keep"))
    docBuckets(Tables.documents(s, d))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
      .select(col("doc_id"), col("score"), (col("score") >= 0.5).as("pred"))
      .join(gate, "doc_id")
  }

  /** Pinned sigmoid lookup: σ(z)·10⁶ rounded, z from −8.00 to +8.00 nats
    * at centi-nat grain (1601 entries; σ(±8) has saturated to
    * 335 ppm / 999665 ppm, so the clamp loses nothing a ppm output could
    * show). StrictMath keeps the table bit-identical on any JVM, and the
    * DuckDB literal list is generated from this same Seq — both engines
    * look up the same integers by construction (the VERDICT-r14
    * fixed-point-sigmoid device). */
  val SigmoidPpm: IndexedSeq[Long] =
    (0 to 1600).map(i =>
      math.round(1e6 / (1.0 + StrictMath.exp(-(i - 800) / 100.0))))

  /** The quantized doc-stat feature space of the declared NB model:
    * (name, value expression over gopherGate's stat columns, category
    * count for Laplace smoothing). Word-count decile, stopword count,
    * mean word length, symbol rate — the generic Gopher-style quality
    * statistics (Rae 2021 §A1), quantized so NB's per-category counts
    * are exact integers both engines reproduce. */
  private val StatFeatures: Seq[(String, String, Int)] = Seq(
    ("wb", "least(n_words div 10, 15)", 16),
    ("sb", "least(n_stop, 7)", 8),
    ("lb", "least(char_sum div greatest(n_words, 1), 15)", 16),
    ("yb", "least((10 * n_sym) div greatest(n_words, 1), 7)", 8))

  /** Declared query (oracle-bearing since r15 — closed-form model +
    * fixed-point ln + pinned sigmoid table replaced the L-BFGS float
    * path): per-doc learned quality score as σ(z) in integer PPM, the
    * exact sign prediction z ≥ 0, and the heuristic gate label.
    *
    * The model is the logistic twin DuckDB can re-derive: categorical
    * naive Bayes over the quantized [[StatFeatures]], trained on the
    * same gate labels —
    *   z = ln((N₁+1)/(N₀+1)) + Σ_f [ln((n₁_fv+1)/(N₁+K_f)) −
    *       ln((n₀_fv+1)/(N₀+K_f))]
    * with every ln the [[graft.operators.FixedPoint.lnFpStages]]
    * truncated series (< 5·10⁻¹¹ rel). Each doc has exactly one value
    * per feature, so the smoothing denominators contract to one
    * corpus-level constant. σ is the pinned [[SigmoidPpm]] table over z
    * clamped to ±8 nats at centi-nat grain; `pred` is declared from the
    * un-clamped exact integer sign, not the table. (A hashed-bucket NB
    * was measured first and rejected: 0.55 accuracy vs this form's 1.00
    * on the fixture — naive independence over 256 correlated presence
    * bits cannot mimic a length-driven gate.)
    *
    * Scale shape: the ln series runs on the ≤48-row (feat, val) table
    * and a 1-row class-count scalar (constant-folded), NEVER per
    * document; per-doc cost is one 4-row explode + one broadcast join +
    * one sum. Two corpus exchanges total, same as the float version. */
  val qQualityLogistic: Q = (s, d) => {
    import graft.operators.FixedPoint._
    val docs = Tables.documents(s, d)
    // the gate-stat frame feeds three consumers (the feature melt, the
    // class-count scalar, the final label join) — eagerly checkpointed
    // once per (session, corpus) so the corpus tokenization pass does
    // not re-run per reference (it showed up as 3.3 s of the sf0.1
    // bench before the memo)
    val g = Artifacts.memo(gateStatsCache,
        s"gate:${System.identityHashCode(s)}:$d") {
      TextQueries.gopherGate(docs).select(col("doc_id"),
        col("n_words"), col("char_sum"), col("n_sym"), col("n_stop"),
        col("keep")).localCheckpoint(true)
    }
    val feats = g.select(col("doc_id"), col("keep"),
        explode(array(StatFeatures.map { case (f, v, _) =>
          struct(lit(f).as("feat"), expr(v).as("val"))
        }: _*)).as("fv"))
      .select(col("doc_id"), col("keep"),
        col("fv.feat").as("feat"), col("fv.val").as("val"))
    // The trained model is a bounded driver artifact (the IVF-centroid
    // device): the (feat, val) table is ≤ 48 rows BY CONSTRUCTION (4
    // literal feats × least()-clamped values) and the class counts one
    // row, so the lns run through the driver-side lnFpScala mirror —
    // bit-equal to the staged form the oracle still executes over its
    // own CTEs, and ~7 s of Catalyst work per plan build cheaper than
    // staging 60 ln columns. Memoized per (session, corpus) so repeated
    // plan construction stays job-free (LazyRegistrySpec).
    val (c1, c0, wRows) = Artifacts.memo(classCountCache,
        s"${System.identityHashCode(s)}:$d") {
      val cc = g.agg(sum(when(col("keep"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("c0")).head()
      val bs = feats.groupBy("feat", "val")
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("n0"))
        .collect()
      (cc.getLong(0), cc.getLong(1), bs.map { r =>
        (r.getString(0), r.getLong(1),
          lnFpScala(r.getLong(2) + 1) - lnFpScala(r.getLong(3) + 1))
      }.toSeq)
    }
    val wSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("feat",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("val",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("wd_fp",
        org.apache.spark.sql.types.DecimalType(38, 0))))
    val w = s.createDataFrame(
      java.util.Arrays.asList(wRows.map { case (f, v, wd) =>
        org.apache.spark.sql.Row(f, v, new java.math.BigDecimal(
          wd.bigInteger)): org.apache.spark.sql.Row
      }: _*), wSchema)
    val z = feats.join(broadcast(w), Seq("feat", "val"))
      .groupBy("doc_id")
      .agg(sum(col("wd_fp")).as("sw"))
    // the six class-count lns are corpus scalars — computed with the
    // driver-side lnFpScala mirror (bit-equal to the staged form, which
    // the oracle still runs over its cc CTE) and folded into ONE
    // literal: six staged literal chains cost 16 s of Catalyst constant
    // folding per plan build
    val constFp = (lnFpScala(c1 + 1) - lnFpScala(c0 + 1)) +
      2 * (lnFpScala(c0 + 16) - lnFpScala(c1 + 16)) +
      2 * (lnFpScala(c0 + 8) - lnFpScala(c1 + 8))
    val zf = z.withColumn("z_fp",
      lit(scala.math.BigDecimal(constFp)).cast("decimal(38,0)") +
        col("sw"))
    zf.withColumn("idx", expr(
        "CAST((greatest(CAST(-8000000000000000000 AS DECIMAL(38,0)), " +
          "least(CAST(8000000000000000000 AS DECIMAL(38,0)), z_fp)) " +
          "+ 8000000000000000000) div 10000000000000000 AS INT)"))
      .select(col("doc_id"),
        element_at(lit(SigmoidPpm.toArray), col("idx") + 1)
          .as("score_ppm"),
        (col("z_fp") >= 0).as("pred"))
      .join(g.select("doc_id", "keep"), "doc_id")
  }

  /** Exact AUC (Mann–Whitney U) evaluation, one-vs-rest per language,
    * scoring each document by `n_chars` — the eval-harness statistic a
    * scorer ([[qQualityLogistic]]) is judged by, computed WITHOUT
    * floats: ranks come from the score HISTOGRAM (group by score →
    * running count), tied ranks use the doubled-average-rank device
    * (2·avgrank = 2·cum_before + n_g + 1, an integer), and
    * AUC_ppm = (2·R⁺ − n⁺(n⁺+1)) · 10⁶ div (2·n⁺·n⁻).
    *
    * Scale shape: ONE corpus scan builds the (score, lang) cell table;
    * the score histogram, its rank window, the broadcast join back, and
    * the per-lang fold all run over histogram-sized data (|distinct
    * scores| rows) — AUC at 100 TB costs one corpus exchange, and
    * everything after is as cheap as the histogram is small. (If the
    * score histogram itself outgrew broadcast, swap the broadcast for a
    * score-keyed join — same algebra.) */
  val qEvalAuc: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val perScoreLang = scoreCells(s, d)
    val perScore = perScoreLang.groupBy(col("score"))
      .agg(sum(col("n_pos_g")).as("n_g"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore.withColumn("cum_before",
      coalesce(sum(col("n_g")).over(w), lit(0L)))
    def dec(c: Column) = c.cast("decimal(19,0)")
    perScoreLang.join(broadcast(ranked), "score")
      .groupBy(col("lang"))
      .agg(sum(col("n_pos_g")).as("n_pos"),
        sum(dec(col("n_pos_g")) * dec(lit(2L) * col("cum_before")
          + col("n_g") + lit(1L))).as("r2"))
      // the corpus total re-derives from the 5-row fold itself (every doc
      // has exactly one lang) — no scalar join, no driver-side count
      .withColumn("total",
        sum(col("n_pos")).over(Window.partitionBy()))
      .select(col("lang"), col("n_pos"),
        (col("total") - col("n_pos")).as("n_neg"),
        // guard: a label spanning the whole corpus has no negative
        // class — NULL (DuckDB's // 0 likewise), not an ANSI error
        expr("""CASE WHEN total > n_pos THEN
                CAST(((r2 - CAST(n_pos AS DECIMAL(19,0)) * (n_pos + 1))
                  * 1000000)
                div (2 * CAST(n_pos AS DECIMAL(19,0)) * (total - n_pos))
                AS LONG) END""").as("auc_ppm"))
  }

  /** Declared confusion threshold: predict positive when the score
    * (n_chars) clears the fixture median — both branches populated at
    * every sf. */
  val ConfusionCut = 300L

  /** Gains / lift / PR curve at score-histogram grain, one-vs-rest per
    * language: for every (score, lang) CELL, ranking documents by score
    * descending, the cumulative capture of that language —
    * `cum_n` (documents at or above the score), `cum_pos` (of them, in
    * the language), and the three exact readouts a ranking evaluation
    * wants: `recall_ppm` (= the gains curve), `precision_ppm` (= the PR
    * curve at this threshold), `lift_ppm` (capture rate over base
    * rate). Emitting one row per OBSERVED cell is the histogram-grain
    * device [[qEvalAuc]] established: the curve is exact at every
    * threshold that changes it, and no per-document ranking (global
    * sort) ever happens.
    *
    * Scale shape: the corpus contracts once into [[scoreCells]]
    * (shared, persisted); the global per-score histogram broadcasts
    * back onto the cell table, and both cumulative windows ride
    * histogram-sized data. A 100 TB corpus pays one exchange; the
    * curve costs what the histogram costs. Headroom: cum_pos·total·10⁶
    * ≤ 10³⁰ at 10¹² docs inside decimal(38). */
  val qEvalGains: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cells = scoreCells(s, d)
    val perScore = cells.groupBy(col("score"))
      .agg(sum(col("n_pos_g")).as("n_g"))
    val wDesc = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = perScore
      .withColumn("cum_n", sum(col("n_g")).over(wDesc))
      .withColumn("total",
        sum(col("n_g")).over(Window.partitionBy()))
      .select(col("score"), col("cum_n"), col("total"))
    val wLang = Window.partitionBy(col("lang"))
      .orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAllLang = Window.partitionBy(col("lang"))
    cells.join(broadcast(ranked), "score")
      .withColumn("cum_pos", sum(col("n_pos_g")).over(wLang))
      .withColumn("n_pos", sum(col("n_pos_g")).over(wAllLang))
      .select(col("lang"), col("score"), col("cum_n"), col("cum_pos"),
        expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000" +
          " div n_pos AS LONG)").as("recall_ppm"),
        expr("CAST(CAST(cum_pos AS DECIMAL(38,0)) * 1000000" +
          " div cum_n AS LONG)").as("precision_ppm"),
        expr("CAST((CAST(cum_pos AS DECIMAL(38,0)) * total * 1000000)" +
          " div (CAST(cum_n AS DECIMAL(38,0)) * n_pos) AS LONG)")
          .as("lift_ppm"))
  }

  /** Confusion-matrix evaluation of the declared threshold scorer
    * (positive ⇔ n_chars ≥ [[ConfusionCut]]), one-vs-rest per language:
    * tp/fp/fn/tn plus exact precision / recall / F1 in ppm
    * (F1 = 2·tp·10⁶ div (2·tp + fp + fn) — the harmonic mean without a
    * float). Degenerate classes (no predicted positives) read NULL
    * precision, mirroring DuckDB's `// 0`.
    *
    * Scale shape: everything derives from the shared [[scoreCells]]
    * contraction — one 5-row per-lang fold over the cells plus a 1-row
    * global rollup re-derived from the fold itself (window over the
    * 5-row frame, no second scan, no driver scalar). */
  val qEvalConfusion: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val cells = scoreCells(s, d)
    val perLang = cells.groupBy(col("lang"))
      .agg(sum(when(col("score") >= ConfusionCut, col("n_pos_g"))
        .otherwise(lit(0L))).as("tp"),
        sum(col("n_pos_g")).as("n_pos"))
    val wAll = Window.partitionBy()
    perLang
      .withColumn("hi", sum(col("tp")).over(wAll))
      .withColumn("total", sum(col("n_pos")).over(wAll))
      .select(col("lang"), col("tp"),
        (col("hi") - col("tp")).as("fp"),
        (col("n_pos") - col("tp")).as("fn"),
        (col("total") - col("hi") - col("n_pos") + col("tp")).as("tn"),
        expr("CASE WHEN hi > 0 THEN CAST(CAST(tp AS DECIMAL(38,0))" +
          " * 1000000 div hi AS LONG) END").as("precision_ppm"),
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 div n_pos AS LONG)")
          .as("recall_ppm"),
        // 2tp + fp + fn = hi + n_pos, and n_pos ≥ 1 on every emitted
        // lang row, so F1's denominator never vanishes
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 2000000" +
          " div (hi + n_pos) AS LONG)").as("f1_ppm"))
  }

  /** Width of a reliability-diagram bucket in score (n_chars) units. */
  val CalibrationBinWidth = 100L

  /** Reliability diagram (calibration curve) for the one-vs-rest 'en'
    * scorer, the third leg of the eval harness next to [[qEvalAuc]]
    * (discrimination) and [[qEvalGains]] (ranking): bucket the score
    * into fixed-width bins and compare, per bin, the mean score against
    * the observed positive rate — a well-calibrated scorer's curve
    * hugs the diagonal, and drift between the two columns is the
    * standard miscalibration readout. All integer-exact: mean score in
    * milli (Σscore·1000 div n), observed rate in ppm; empty-positive
    * bins read 0 via the same COALESCE on both engines.
    *
    * Scale shape: rides the shared persisted [[scoreCells]] contraction
    * — the per-bin fold is histogram-sized, so calibration at 100 TB
    * costs nothing beyond the artifact every other eval query already
    * pays for once. Headroom: Σscore·1000 in decimal(38) past 10²⁰
    * docs per bin. */
  val qEvalCalibration: Q = (s, d) => {
    val cells = scoreCells(s, d)
    cells.groupBy(expr(s"CAST(score AS LONG) div $CalibrationBinWidth")
        .as("bin"))
      .agg(sum(col("n_pos_g")).as("n"),
        sum(col("score").cast("decimal(38,0)") * col("n_pos_g"))
          .as("score_sum"),
        coalesce(sum(when(col("lang") === "en", col("n_pos_g"))), lit(0L))
          .as("n_pos"))
      .select(col("bin"), col("n"),
        expr("CAST(score_sum * 1000 div n AS LONG)")
          .as("mean_score_milli"),
        col("n_pos"),
        expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * 1000000 div n AS LONG)")
          .as("pos_rate_ppm"))
  }

  /** Brier score of the binned historical-rate predictor: predict each
    * document's P(en) as its [[qEvalCalibration]] bin's observed rate,
    * then score mean squared error against the true outcome — the
    * proper scoring rule that closes the eval harness (AUC ranks,
    * calibration eyeballs, Brier PRICES). Exactly integer at the
    * micro² grain: rate in ppm, outcome at 10⁶, per-doc squared error
    * (rate − y·10⁶)², reported as `brier_micro2 = Σ div n` (0 =
    * perfect, 2.5·10¹¹ = the coin-flip 0.25 ceiling for a balanced
    * class). In-sample by declaration — the predictor and the
    * evaluation share the corpus, exactly how a pipeline smoke-checks
    * its calibration table before deployment.
    *
    * Scale shape: two passes over the SHARED persisted [[scoreCells]]
    * contraction (bin rates, then the weighted fold with the rate
    * table broadcast back) — the corpus itself scans once across the
    * whole eval family. Headroom: n_g·(rate−y)² ≤ 10¹²·n in
    * decimal(38) past 10²⁰ docs. */
  val qEvalBrier: Q = (s, d) => {
    val cells = scoreCells(s, d).withColumn("bin",
      expr(s"CAST(score AS LONG) div $CalibrationBinWidth"))
    val binRate = cells.groupBy(col("bin"))
      .agg(sum(col("n_pos_g")).as("bn"),
        coalesce(sum(when(col("lang") === "en", col("n_pos_g"))), lit(0L))
          .as("bpos"))
      .select(col("bin"),
        expr("CAST(CAST(bpos AS DECIMAL(38,0)) * 1000000 div bn AS LONG)")
          .as("rate_ppm"))
    cells.join(broadcast(binRate), "bin")
      .withColumn("y6",
        when(col("lang") === "en", 1000000L).otherwise(0L))
      .agg(sum(col("n_pos_g")).as("n"),
        sum(col("n_pos_g").cast("decimal(38,0)")
          * (col("rate_ppm") - col("y6")) * (col("rate_ppm") - col("y6")))
          .as("se"))
      .select(col("n"),
        expr("CAST(se div n AS LONG)").as("brier_micro2"))
  }

  val queries: Map[String, Q] = Map(
    "q_quality_logistic" -> qQualityLogistic,
    "q_eval_auc" -> qEvalAuc,
    "q_eval_gains" -> qEvalGains,
    "q_eval_confusion" -> qEvalConfusion,
    "q_eval_calibration" -> qEvalCalibration,
    "q_eval_brier" -> qEvalBrier)

  /** Everything here is integer-exact and oracle-pinned —
    * q_quality_logistic joined the class in r15 via the fixed-point ln
    * + pinned sigmoid table (the MLlib float path stays JVM-verified as
    * [[mlLogisticScored]]). */
  val oracleSql: Map[String, String] = Map(
    "q_quality_logistic" -> {
      import graft.operators.FixedPoint._
      val (wCte, wLast) = cteStages("bs1",
        lnFpStages("n1p", "a_", DuckFp) ++ lnFpStages("n0p", "b_", DuckFp),
        "wl")
      val (ccCte, ccLast) = cteStages("cc",
        lnFpStages("c1p", "i1_", DuckFp) ++
          lnFpStages("c0p", "i0_", DuckFp) ++
          lnFpStages("c1s", "s1_", DuckFp) ++
          lnFpStages("c0s", "s0_", DuckFp) ++
          lnFpStages("c1e", "e1_", DuckFp) ++
          lnFpStages("c0e", "e0_", DuckFp), "cl")
      val sigList = SigmoidPpm.mkString("[", ", ", "]")
      // the (feat, value) melt — same expressions as StatFeatures, with
      // Spark's `div` spelled as DuckDB's `//`
      val featSelects = StatFeatures.map { case (f, v, _) =>
        val dv = v.replace(" div ", " // ")
        s"SELECT doc_id, keep, '$f' AS feat, CAST(($dv) AS BIGINT) AS val FROM g"
      }.mkString("\n           UNION ALL ")
      s"""WITH t AS (
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
           FROM t),
         g AS (
           SELECT doc_id, n_words, char_sum, n_sym, n_stop,
             ((n_words BETWEEN 50 AND 100000)
               AND (3*n_words <= char_sum AND char_sum <= 10*n_words)
               AND (10*n_sym <= n_words) AND (5*n_alpha >= 4*n_words)
               AND (n_stop >= 2)) AS keep
           FROM m),
         f AS ($featSelects),
         bs AS (
           SELECT feat, val,
             SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS n0
           FROM f GROUP BY feat, val),
         bs1 AS (SELECT feat, val, n1 + 1 AS n1p, n0 + 1 AS n0p FROM bs),
         $wCte,
         w AS (SELECT feat, val, a_ln - b_ln AS wd_fp FROM $wLast),
         cc AS (
           SELECT SUM(CASE WHEN keep THEN 1 ELSE 0 END) + 1 AS c1p,
             SUM(CASE WHEN keep THEN 0 ELSE 1 END) + 1 AS c0p,
             SUM(CASE WHEN keep THEN 1 ELSE 0 END) + 16 AS c1s,
             SUM(CASE WHEN keep THEN 0 ELSE 1 END) + 16 AS c0s,
             SUM(CASE WHEN keep THEN 1 ELSE 0 END) + 8 AS c1e,
             SUM(CASE WHEN keep THEN 0 ELSE 1 END) + 8 AS c0e
           FROM g),
         $ccCte,
         ccl AS (SELECT i1_ln, i0_ln, s1_ln, s0_ln, e1_ln, e0_ln
                 FROM $ccLast),
         z AS (
           SELECT doc_id, SUM(wd_fp) AS sw
           FROM f JOIN w USING (feat, val) GROUP BY doc_id),
         zf AS (
           SELECT z.doc_id,
             ccl.i1_ln - ccl.i0_ln + 2 * (ccl.s0_ln - ccl.s1_ln)
               + 2 * (ccl.e0_ln - ccl.e1_ln) + z.sw AS z_fp
           FROM z, ccl)
         SELECT zf.doc_id,
           CAST(($sigList)[
             CAST((greatest(CAST(-8000000000000000000 AS HUGEINT),
               least(CAST(8000000000000000000 AS HUGEINT), z_fp))
               + 8000000000000000000) // 10000000000000000 AS INT) + 1]
             AS BIGINT) AS score_ppm,
           z_fp >= 0 AS pred, g.keep
         FROM zf JOIN g USING (doc_id) ORDER BY zf.doc_id"""
    },
    "q_eval_brier" ->
      """WITH pl AS (
           SELECT n_chars AS score, lang, COUNT(*) AS n_pos_g
           FROM documents GROUP BY 1, 2),
         c AS (
           SELECT CAST(score AS BIGINT) // 100 AS bin, lang, n_pos_g
           FROM pl),
         br AS (
           SELECT bin,
             CAST(COALESCE(SUM(n_pos_g) FILTER (WHERE lang = 'en'), 0)
               AS HUGEINT) * 1000000 // SUM(n_pos_g) AS rate_ppm
           FROM c GROUP BY 1),
         f AS (
           SELECT SUM(c.n_pos_g) AS n,
             SUM(CAST(c.n_pos_g AS HUGEINT)
               * (br.rate_ppm - CASE WHEN c.lang = 'en'
                   THEN 1000000 ELSE 0 END)
               * (br.rate_ppm - CASE WHEN c.lang = 'en'
                   THEN 1000000 ELSE 0 END)) AS se
           FROM c JOIN br USING (bin))
         SELECT CAST(n AS BIGINT) AS n,
           CAST(se // n AS BIGINT) AS brier_micro2
         FROM f""",
    "q_eval_calibration" ->
      """WITH pl AS (
           SELECT n_chars AS score, lang, COUNT(*) AS n_pos_g
           FROM documents GROUP BY 1, 2),
         b AS (
           SELECT CAST(score AS BIGINT) // 100 AS bin,
             SUM(n_pos_g) AS n,
             SUM(CAST(score AS HUGEINT) * n_pos_g) AS score_sum,
             COALESCE(SUM(n_pos_g) FILTER (WHERE lang = 'en'), 0) AS n_pos
           FROM pl GROUP BY 1)
         SELECT bin, CAST(n AS BIGINT) AS n,
           CAST(score_sum * 1000 // n AS BIGINT) AS mean_score_milli,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(CAST(n_pos AS HUGEINT) * 1000000 // n AS BIGINT)
             AS pos_rate_ppm
         FROM b ORDER BY bin""",
    "q_eval_gains" ->
      """WITH pl AS (
           SELECT n_chars AS score, lang, COUNT(*) AS n_pos_g
           FROM documents GROUP BY 1, 2),
         h AS (
           SELECT score, SUM(n_pos_g) AS n_g FROM pl GROUP BY 1),
         r AS (
           SELECT score,
             SUM(n_g) OVER (ORDER BY score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             SUM(n_g) OVER () AS total
           FROM h),
         c AS (
           SELECT pl.lang, pl.score, r.cum_n, r.total,
             SUM(pl.n_pos_g) OVER (PARTITION BY pl.lang
               ORDER BY pl.score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos,
             SUM(pl.n_pos_g) OVER (PARTITION BY pl.lang) AS n_pos
           FROM pl JOIN r USING (score))
         SELECT lang, score,
           CAST(cum_n AS BIGINT) AS cum_n,
           CAST(cum_pos AS BIGINT) AS cum_pos,
           CAST(CAST(cum_pos AS HUGEINT) * 1000000 // n_pos AS BIGINT)
             AS recall_ppm,
           CAST(CAST(cum_pos AS HUGEINT) * 1000000 // cum_n AS BIGINT)
             AS precision_ppm,
           CAST(CAST(cum_pos AS HUGEINT) * total * 1000000
             // (CAST(cum_n AS HUGEINT) * n_pos) AS BIGINT) AS lift_ppm
         FROM c ORDER BY lang, score""",
    "q_eval_confusion" ->
      """WITH pl AS (
           SELECT lang,
             SUM(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS tp,
             COUNT(*) AS n_pos
           FROM documents GROUP BY 1),
         g AS (
           SELECT lang, tp, n_pos,
             SUM(tp) OVER () AS hi, SUM(n_pos) OVER () AS total
           FROM pl)
         SELECT lang, CAST(tp AS BIGINT) AS tp,
           CAST(hi - tp AS BIGINT) AS fp,
           CAST(n_pos - tp AS BIGINT) AS fn,
           CAST(total - hi - n_pos + tp AS BIGINT) AS tn,
           CASE WHEN hi > 0
             THEN CAST(CAST(tp AS HUGEINT) * 1000000 // hi AS BIGINT) END
             AS precision_ppm,
           CAST(CAST(tp AS HUGEINT) * 1000000 // n_pos AS BIGINT)
             AS recall_ppm,
           CAST(CAST(tp AS HUGEINT) * 2000000 // (hi + n_pos) AS BIGINT)
             AS f1_ppm
         FROM g ORDER BY lang""",
    "q_eval_auc" ->
      """WITH h AS (
           SELECT n_chars AS score, COUNT(*) AS n_g FROM documents
           GROUP BY 1),
         r AS (
           SELECT score, n_g,
             COALESCE(SUM(n_g) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
           FROM h),
         pl AS (
           SELECT n_chars AS score, lang, COUNT(*) AS n_pos_g
           FROM documents GROUP BY 1, 2),
         t AS (SELECT COUNT(*) AS total FROM documents),
         f AS (
           SELECT pl.lang,
             CAST(SUM(pl.n_pos_g) AS BIGINT) AS n_pos,
             CAST(SUM(pl.n_pos_g * (2 * r.cum_before + r.n_g + 1))
               AS HUGEINT) AS r2
           FROM pl JOIN r USING (score) GROUP BY pl.lang)
         SELECT lang, n_pos,
           CAST(t.total - n_pos AS BIGINT) AS n_neg,
           CAST(((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000)
             // (2 * CAST(n_pos AS HUGEINT) * (t.total - n_pos))
             AS BIGINT) AS auc_ppm
         FROM f, t""")
}
