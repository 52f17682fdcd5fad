package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Feature engineering for training-data pipelines: the transforms that
  * turn raw lake columns into model inputs — one-hot indicators, fixed-
  * width bucketization, leave-one-out target encoding, per-group min-max
  * scaling, k-fold assignment, and inverse-frequency class weights.
  *
  * Reference basis: the reference preps its model-facing table with
  * pandas column surgery after scraping (`dags/warsaw-delays.py:183-187`
  * — fixed column list + timestamp stamp); the north-star training-data
  * mandate (SURVEY.md §2 "large-scale training-data pipeline") supplies
  * the rest of the surface.
  *
  * Cross-engine exactness: every encoded value is an integer — cents via
  * DECIMAL(18,2) casts, ratios as `x * 10^6 div denom` parts-per-million
  * (the §7.4 convention) — so Spark and DuckDB agree bit-for-bit with no
  * float accumulation anywhere.
  *
  * Scale notes: one-hot and bucketize are stateless row maps (no
  * shuffle; codegen'd CASE chains). Target encoding and scaling join a
  * 5-row per-group statistics table back to the fact side — Catalyst
  * broadcasts it, so the fact table never shuffles. K-fold and class
  * weights are single hash-agg rollups; the class-weight window runs
  * over the 5-row aggregate, never the raw scan.
  */
object FeatureOps {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)

  /** o_totalprice in exact integer cents. */
  private def cents(c: String) =
    (col(c).cast(dec2) * lit(100)).cast("long")

  private val Priorities = Seq(
    "1-URGENT" -> "is_p1", "2-HIGH" -> "is_p2", "3-MEDIUM" -> "is_p3",
    "4-NOT SPECIFIED" -> "is_p4", "5-LOW" -> "is_p5")

  /** One-hot encoding of the (closed, 5-value) order-priority domain
    * into 0/1 indicator columns. The domain is pinned in code, not
    * discovered at runtime — at 100 TB a `collect()` of distinct values
    * to build columns is a full extra scan and a nondeterministic column
    * set; a curated vocabulary is the production pattern. */
  val qFeatureOnehot: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey") +: Priorities.map { case (v, c) =>
        when(col("o_orderpriority") === v, 1).otherwise(0).as(c)
      }: _*)

  /** Fixed-width bucketization of order price: 10 buckets of 50 000
    * currency units, open-ended top bucket. Bucket ids come from exact
    * integer cents (`cents div 5 000 000`), so edge rows land in the
    * same bucket in every engine — the classic float-edge hazard of
    * `floor(price / width)` never arises. */
  val qFeatureBucketize: Q = (s, d) =>
    Tables.orders(s, d)
      .withColumn("cents", cents("o_totalprice"))
      .withColumn("bucket", least(expr("cents div 5000000"), lit(9L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(col("cents")).as("sum_cents"))

  /** Leave-one-out target encoding of the customer market segment
    * against a positive-balance label. Plain mean-encoding leaks the
    * row's own label into its feature; LOO subtracts it:
    * `(S_g - y_i) / (n_g - 1)`, emitted as exact ppm. The per-segment
    * sufficient statistics (5 rows) broadcast back onto customers. */
  val qFeatureTargetEnc: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .withColumn("y", when(col("c_acctbal") > 0.0, 1L).otherwise(0L))
    val seg = cust.groupBy(col("c_mktsegment"))
      .agg(sum(col("y")).as("s_pos"), count(lit(1)).as("n_grp"))
    cust.join(broadcast(seg), Seq("c_mktsegment"))
      .select(col("c_custkey"), col("c_mktsegment"), col("y"),
        // guard: a 1-customer segment has no leave-one-out peer set —
        // NULL, matching DuckDB's NULL on integer // 0 (ANSI Spark
        // would otherwise raise DIVIDE_BY_ZERO)
        expr("""CASE WHEN n_grp > 1
                THEN ((s_pos - y) * 1000000) div (n_grp - 1) END""")
          .as("loo_ppm"))
  }

  /** Per-segment min-max scaling of account balance to [0, 10^6]
    * integer ppm. Min/max are computed on exact cents per segment and
    * broadcast-joined back — the raw scan is touched once and never
    * shuffled. (A window over the fact table would re-sort 100 TB for
    * a 5-row statistic.) */
  val qFeatureScale: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .withColumn("bal_cents", cents("c_acctbal"))
    val rng = cust.groupBy(col("c_mktsegment"))
      .agg(min(col("bal_cents")).as("lo"), max(col("bal_cents")).as("hi"))
    cust.join(broadcast(rng), Seq("c_mktsegment"))
      .select(col("c_custkey"), col("c_mktsegment"),
        // guard: a constant-balance segment has zero range — NULL, the
        // same NULL DuckDB's // 0 yields (ANSI Spark would raise)
        expr("""CASE WHEN hi > lo
                THEN ((bal_cents - lo) * 1000000) div (hi - lo) END""")
          .as("scaled_ppm"))
  }

  /** Deterministic 5-fold cross-validation assignment over documents
    * (salted md5 id-bucket, [[Hashing.md5Bucket]]) with a per-fold ×
    * language census — the stratification check a splitter runs before
    * training. Pure hash-agg, no shuffle beyond the rollup. */
  val qTrainKfold: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("fold", Hashing.md5Bucket(col("doc_id"), "kfold", 5L))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n"))

  /** Inverse-frequency class weights over the document language label:
    * `w_c = N / (K * n_c)` in exact ppm (sklearn's "balanced" heuristic).
    * The window runs over the 5-row aggregated label table, not the
    * corpus scan. */
  val qClassWeights: Q = (s, d) => {
    val byLang = Tables.documents(s, d)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy()
    byLang
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("k_classes", count(lit(1)).over(w))
      .select(col("lang"), col("n"),
        // decimal(19,0) product, matching the oracle's HUGEINT ride —
        // N·10⁶ overflows Long past ~9.2e12 docs otherwise
        expr("""(CAST(total AS DECIMAL(19,0)) * 1000000)
                div (CAST(k_classes AS DECIMAL(19,0)) * n)""")
          .as("weight_ppm"))
  }

  /** Per-segment winsorization (clip at exact p05/p95 order statistics)
    * of the account balance — the robust-scaling prequel to
    * [[qFeatureScale]] that keeps one fat-tailed outlier from crushing
    * the min-max range. Percentile INDICES are a DECLARED rule
    * (lo = max(1, ⌊5n/100⌋), hi = min(n, ⌊95n/100⌋+1) over the
    * (cents, key)-ordered ranks) so both engines pick identical exact
    * cents values; the clip itself is greatest/least.
    *
    * 100 TB shape: exact order statistics WITHOUT sorting the fact
    * table — the stream contracts to (segment, cents-value) cells (one
    * map-side-combinable rollup, ≤ |value domain| rows per segment),
    * the cumulative rank walk runs over that contraction, and the
    * 5-row bounds table broadcast-joins back to the scan. The same
    * value-contraction device as the weighted percentiles and the AUC
    * histogram. */
  val qFeatureWinsorize: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment").as("seg"),
        cents("c_acctbal").as("cents"))
    val cells = cust.groupBy(col("seg"), col("cents"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("seg").orderBy("cents")
    val wSeg = Window.partitionBy("seg")
    val bounds = cells
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wSeg))
      .withColumn("lo_idx", greatest(lit(1L), expr("(5 * n) div 100")))
      .withColumn("hi_idx", least(col("n"), expr("(95 * n) div 100 + 1")))
      .groupBy(col("seg"))
      .agg(min(when(col("cum") >= col("lo_idx"), col("cents"))).as("lo"),
        min(when(col("cum") >= col("hi_idx"), col("cents"))).as("hi"))
    cust.join(broadcast(bounds), Seq("seg"))
      .select(col("c_custkey"), col("seg"), col("cents"),
        greatest(col("lo"), least(col("hi"), col("cents"))).as("w_cents"),
        (col("cents") < col("lo") || col("cents") > col("hi"))
          .as("clipped"))
  }

  val queries: Map[String, Q] = Map(
    "q_feature_onehot" -> qFeatureOnehot,
    "q_feature_bucketize" -> qFeatureBucketize,
    "q_feature_target_enc" -> qFeatureTargetEnc,
    "q_feature_scale" -> qFeatureScale,
    "q_feature_winsorize" -> qFeatureWinsorize,
    "q_train_kfold" -> qTrainKfold,
    "q_class_weights" -> qClassWeights)

  val oracleSql: Map[String, String] = Map(
    "q_feature_onehot" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_p1,
           CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS is_p2,
           CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS is_p3,
           CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END
             AS is_p4,
           CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS is_p5
         FROM orders WHERE o_totalprice > 400000.0""",
    "q_feature_bucketize" ->
      """SELECT least(cents // 5000000, 9) AS bucket,
           COUNT(*) AS n, MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
         FROM (SELECT o_totalprice,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
               FROM orders)
         GROUP BY 1""",
    "q_feature_target_enc" ->
      """SELECT c_custkey, c_mktsegment, y,
           CAST(((SUM(y) OVER (PARTITION BY c_mktsegment) - y) * 1000000)
             // (COUNT(*) OVER (PARTITION BY c_mktsegment) - 1) AS BIGINT)
             AS loo_ppm
         FROM (SELECT c_custkey, c_mktsegment,
                 CAST(CASE WHEN c_acctbal > 0.0 THEN 1 ELSE 0 END AS BIGINT)
                   AS y
               FROM customer)""",
    "q_feature_scale" ->
      """SELECT c_custkey, c_mktsegment,
           CAST(((bal_cents
               - MIN(bal_cents) OVER (PARTITION BY c_mktsegment)) * 1000000)
           // (MAX(bal_cents) OVER (PARTITION BY c_mktsegment)
               - MIN(bal_cents) OVER (PARTITION BY c_mktsegment)) AS BIGINT)
             AS scaled_ppm
         FROM (SELECT c_custkey, c_mktsegment,
                 CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS bal_cents
               FROM customer)""",
    "q_feature_winsorize" ->
      """WITH cust AS (
           SELECT c_custkey, c_mktsegment AS seg,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
           FROM customer),
         cells AS (
           SELECT seg, cents, COUNT(*) AS c FROM cust GROUP BY 1, 2),
         rk AS (
           SELECT seg, cents,
             SUM(c) OVER (PARTITION BY seg ORDER BY cents) AS cum,
             SUM(c) OVER (PARTITION BY seg) AS n
           FROM cells),
         b AS (
           SELECT seg,
             MIN(CASE WHEN cum >= GREATEST(1, (5 * n) // 100)
               THEN cents END) AS lo,
             MIN(CASE WHEN cum >= LEAST(n, (95 * n) // 100 + 1)
               THEN cents END) AS hi
           FROM rk GROUP BY seg)
         SELECT c_custkey, seg, cents,
           GREATEST(lo, LEAST(hi, cents)) AS w_cents,
           (cents < lo OR cents > hi) AS clipped
         FROM cust JOIN b USING (seg)""",
    "q_train_kfold" ->
      """SELECT CAST(CAST('0x' || substring(
             md5(CAST(doc_id AS VARCHAR) || 'kfold'), 1, 4) AS INT) % 5
           AS BIGINT) AS fold, lang, COUNT(*) AS n
         FROM documents GROUP BY 1, 2""",
    "q_class_weights" ->
      """SELECT lang, n,
           CAST((SUM(n) OVER () * 1000000) // (COUNT(*) OVER () * n)
             AS BIGINT) AS weight_ppm
         FROM (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang)""")
}
