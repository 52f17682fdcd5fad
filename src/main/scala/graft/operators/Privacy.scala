package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Privacy auditing for training-data release — the k-anonymity /
  * l-diversity census a corpus runs before documents (or user traces)
  * leave the curation pipeline. The reference pipeline lands raw per-user
  * scrape rows (dags/warsaw-delays.py:182-186) with no release gate; a
  * production corpus needs to know which quasi-identifier combinations
  * isolate individuals before anyone trains on them.
  *
  * Model (Sweeney 2002 / Machanavajjhala 2007, public literature):
  * quasi-identifiers (QI) are the attributes an adversary can link on;
  * a QI group is k-anonymous when ≥ k records share it, and l-diverse
  * when its sensitive attribute takes ≥ l distinct values. Groups below
  * either floor must be suppressed or generalized before release.
  *
  * Scale shape: ONE map-side-combinable aggregate over the corpus keyed
  * by the QI tuple — count is a plain partial-sum and the l-diversity
  * distinct runs through Spark's standard partial-distinct expansion, so
  * the shuffle carries (QI, partial) rows, never documents. The audit
  * table is |distinct QI| rows regardless of corpus size. Exact integer
  * output → DuckDB oracle.
  */
object Privacy {

  type Q = (SparkSession, String) => DataFrame

  val KFloor = 5
  val LFloor = 2

  /** k-anonymity / l-diversity audit of `docs` under QI = (lang,
    * length bucket of 200 chars) with `source` as the sensitive
    * attribute: per QI group, k (record count), l (distinct sensitive
    * values), and the release flags. A doc-level generalization of the
    * length column into coarse buckets is itself the standard
    * k-anonymity remedy — the bucket width is the generalization knob. */
  def kAnonymityAudit(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        expr("n_chars div 200").as("len_bucket"),
        col("source"))
      .groupBy("lang", "len_bucket")
      .agg(count(lit(1)).as("k"),
        count_distinct(col("source")).as("l_div"))
      .withColumn("k_anonymous", col("k") >= KFloor)
      .withColumn("l_diverse", col("l_div") >= LFloor)
      .withColumn("releasable", col("k") >= KFloor && col("l_div") >= LFloor)

  val qPrivacyKanon: Q = (s, d) => kAnonymityAudit(Tables.documents(s, d))

  /** Erasure (right-to-be-forgotten) propagation plan: given a
    * tombstone set of subjects — here a deterministic 5% md5-bucket of
    * customers standing in for an erasure-request table — cascade the
    * delete down the FK chain (customer → orders → lineitem) and emit
    * the per-subject erasure manifest: how many orders and line items
    * each forget request touches. The manifest-first shape is how a
    * 100 TB lake actually erases: plan counts/keys first (cheap, keyed
    * joins against a broadcast-scale tombstone set), then rewrite only
    * the files the manifest names. Aggregation happens before the
    * join-back, so the output is |tombstones| rows. Only the bounded
    * frames are broadcast-hinted (the tombstone set and the two
    * |tombstones|-row count tables); the lineitem⋈doomed-orders join is
    * left to the planner — doomed orders are a constant fraction of the
    * orders table, so at lake scale that join must be free to shuffle
    * on the order key (AQE still broadcasts it when it happens to be
    * small). */
  def forgetManifest(customer: DataFrame, orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    val tomb = customer
      .filter(Hashing.md5Bucket(col("c_custkey"), "", 20L) === 0L)
      .select(col("c_custkey"))
    val doomedOrders = orders
      .join(broadcast(tomb), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"))
    val nOrders = doomedOrders.groupBy("c_custkey")
      .agg(count(lit(1)).as("n_orders"))
    val nItems = lineitem
      .join(doomedOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("c_custkey")
      .agg(count(lit(1)).as("n_lineitems"))
    tomb
      .join(broadcast(nOrders), Seq("c_custkey"), "left_outer")
      .join(broadcast(nItems), Seq("c_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_lineitems"), lit(0L)).as("n_lineitems"))
  }

  val qPrivacyForget: Q = (s, d) => forgetManifest(
    Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))

  /** Keyed pseudonymization with join consistency — the third leg of
    * the release triad (audit → pseudonymize → erase): subject keys are
    * replaced by a peppered sha-256 prefix (the pepper is a literal
    * here; production fetches it from a secret store and rotates it per
    * release), which is irreversible without the pepper yet DETERMINISTIC,
    * so foreign keys keep joining after the rewrite. The query proves
    * that property: customer and orders are pseudonymized
    * INDEPENDENTLY, re-joined on the pseudonym alone, and the utility
    * column (segment) plus per-subject order counts survive. 64-bit
    * prefix → birthday collisions at ~2³² subjects; widen the prefix
    * past ~10⁸ subjects.
    *
    * Scale shape: pseudonymization is a map-side projection on both
    * sides; the join shuffles on the pseudonym exactly as it would have
    * on the raw key. */
  def pseudonym(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    substring(sha2(concat(lit("p2024:"), c.cast("string")), 256), 1, 16)

  val qPrivacyPseudonym: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .select(pseudonym(col("c_custkey")).as("pid"), col("c_mktsegment"))
    val ord = Tables.orders(s, d)
      .select(pseudonym(col("o_custkey")).as("pid"))
    ord.groupBy(col("pid")).agg(count(lit(1)).as("n_orders"))
      .join(cust, "pid")
      .select(col("pid"), col("c_mktsegment"), col("n_orders"))
  }

  /** Declared t-closeness release threshold (t = 0.2, in ppm). */
  val TClosenessPpm = 200000L

  /** t-closeness audit (Li et al. 2007) of the same QI classes as
    * [[kAnonymityAudit]], sensitive attribute `source` ORDERED
    * lexicographically: per class, the ordered earth-mover's distance
    * between the class's sensitive distribution and the corpus-wide
    * one, exactly —
    * EMD = (1/(m−1)) · Σᵥ |Pcum(v) − Qcum(v)| becomes the integer
    * t_ppm = 10⁶ · Σᵥ |cum_c(v)·N − cum_g(v)·n_c| div ((m−1)·n_c·N)
    * (m = distinct sensitive values; the v = last term is identically
    * zero so the sum runs over the full grid). k-anonymity bounds
    * re-identification, l-diversity bounds attribute disclosure;
    * t-closeness is the third rung — it bounds what the CLASS's skew
    * toward particular sources reveals.
    *
    * Scale shape: ONE corpus exchange builds the (class, source) cell
    * table; the global distribution re-derives from the cells (no
    * second scan), broadcasts onto the |classes|·|V| grid, and both
    * cumulative windows ride that bounded grid. Headroom: the summed
    * |cum_c·N − cum_g·n_c| products stay inside decimal(38) past 10¹²
    * docs with m ≤ 10⁴ sensitive values. */
  def tClosenessAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val cells = docs
      .select(col("lang"), expr("n_chars div 200").as("len_bucket"),
        col("source"))
      .groupBy("lang", "len_bucket", "source")
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val global = cells.groupBy(col("source")).agg(sum(col("c")).as("g"))
      .withColumn("cum_g", sum(col("g")).over(wOrd))
      .withColumn("n_total", sum(col("g")).over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
      .select(col("source"), col("cum_g"), col("n_total"), col("m"))
    val classes = cells.groupBy(col("lang"), col("len_bucket"))
      .agg(sum(col("c")).as("n_c"))
    val wClass = Window.partitionBy("lang", "len_bucket")
      .orderBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes
      .crossJoin(broadcast(global))
      .join(cells, Seq("lang", "len_bucket", "source"), "left")
      .withColumn("cum_c",
        sum(coalesce(col("c"), lit(0L))).over(wClass))
      .groupBy(col("lang"), col("len_bucket"), col("n_c"),
        col("n_total"), col("m"))
      .agg(sum(abs(dec(col("cum_c")) * col("n_total")
        - dec(col("cum_g")) * col("n_c"))).as("emd_num"))
      .select(col("lang"), col("len_bucket"), col("n_c"),
        expr(s"""CASE WHEN m > 1 THEN
                 CAST((emd_num * 1000000)
                   div ((m - 1) * CAST(n_c AS DECIMAL(38,0)) * n_total)
                 AS LONG) ELSE 0 END""").as("t_ppm"))
      .withColumn("t_close", col("t_ppm") <= TClosenessPpm)
  }

  val qPrivacyTcloseness: Q = (s, d) =>
    tClosenessAudit(Tables.documents(s, d))

  /** Generalization ladder for the length quasi-identifier — widths a
    * release pipeline would try, coarsest last. */
  val GenWidths: Seq[Long] = Seq(100L, 200L, 400L, 800L)

  /** Generalization-lattice walk (Sweeney 2002's remedy, made a
    * query): re-run the [[kAnonymityAudit]] census at every rung of
    * the length-bucket ladder and emit, per width, the release
    * readout — class count, classes below [[KFloor]], rows those
    * classes would suppress, the coverage a suppress-and-release
    * policy retains (ppm), and whether the width achieves full
    * k-anonymity. The MINIMAL width with `k_anonymous = true` is the
    * generalization a release picks; the coverage column prices the
    * suppression alternative at every finer rung.
    *
    * Scale shape: each record fans out map-side into |widths| stubs
    * that contract immediately in the (width, lang, bucket) combine
    * (the [[StatsOps]] bootstrap's fan-out-then-contract device) —
    * one keyed exchange over class-sized partials, then a |widths|-row
    * fold; total N re-derives from the fold itself. Headroom:
    * suppressed·10⁶ rides decimal(38) past 10²⁰ rows. */
  val qPrivacyGeneralize: Q = (s, d) => {
    val stubs = Tables.documents(s, d)
      .select(col("lang"), col("n_chars"),
        explode(array(GenWidths.map(lit): _*)).as("width"))
      .select(col("width"), col("lang"),
        expr("n_chars div width").as("bucket"))
    stubs.groupBy(col("width"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("width"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("k") < KFloor, 1L).otherwise(0L)).as("n_below"),
        coalesce(sum(when(col("k") < KFloor, col("k"))), lit(0L))
          .as("rows_suppressed"),
        sum(col("k")).as("n_total"),
        min(col("k")).as("k_min"))
      .select(col("width"), col("n_classes"), col("n_below"),
        col("rows_suppressed"), col("k_min"),
        expr("""CAST((CAST(n_total - rows_suppressed AS DECIMAL(38,0))
                * 1000000) div n_total AS LONG)""").as("coverage_ppm"),
        (col("n_below") === 0L).as("k_anonymous"))
  }

  /** Cumulative CDF of the two-sided geometric (discrete Laplace)
    * distribution with α = 1/2, truncated to [-8, 8] and renormalized,
    * floored into the 2²⁴ draw grain (the [[StatsOps.PoissonCum24]]
    * device): noise K = −8 + #{c : h ≥ c} for a uniform 6-hex md5 draw
    * h ∈ [0, 2²⁴). α = 1/2 ⇔ ε = ln 2 per release under the geometric
    * mechanism. Identical literals in both engines → exact integer
    * inverse-CDF, no floats. */
  val GeomCum24: Seq[Long] = Seq(21902L, 65707L, 153316L, 328535L,
    678973L, 1379849L, 2781601L, 5585104L, 11192111L, 13995614L,
    15397366L, 16098242L, 16448680L, 16623899L, 16711508L, 16755313L)

  /** Geometric-mechanism count demo: the seeded draw is publicly
    * recomputable, so NO actual privacy as shipped. The mechanism is
    * the real thing (Ghosh-Roughgarden-
    * Sundararajan 2009; the integer-noise family the 2020 US Census DAS
    * built on): each released count is the true count plus a two-sided
    * geometric(α=1/2) draw — ε = ln 2 per statistic, sensitivity 1 —
    * but ONLY once the draw comes from entropy the adversary cannot
    * reproduce. Here the draw is a seeded md5 inverse-CDF (md5(lang ||
    * '#dp1')), a deterministic public function of the released group
    * key, chosen so the release is rerun-stable and cross-engine exact
    * for the oracle gate; anyone can recompute it and recover the true
    * counts. A production release substitutes a fresh entropy source
    * for the seed — the mechanism's shape (noise table, grain,
    * truncation) is what carries to production unchanged, not the
    * guarantee of this demo form.
    *
    * 100 TB shape: one map-side-combinable count rollup to |langs|
    * rows; the noise arithmetic runs on the rollup. Only the noisy
    * count is emitted — the true count and the draw never leave the
    * query, matching the DP release contract. */
  val qPrivacyDpCount: Q = (s, d) => {
    val h = graft.functions.Md5Draws24.md5Prefix(
      concat(col("lang"), lit("#dp1")), 6)
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise",
        GeomCum24.map(c => when(h >= c, 1L).otherwise(0L))
          .reduce(_ + _) - lit(8L))
      .select(col("lang"), (col("n_true") + col("noise")).as("n_noisy"))
  }

  val queries: Map[String, Q] = Map(
    "q_privacy_dpcount" -> qPrivacyDpCount,
    "q_privacy_kanon" -> qPrivacyKanon,
    "q_privacy_tcloseness" -> qPrivacyTcloseness,
    "q_privacy_generalize" -> qPrivacyGeneralize,
    "q_privacy_pseudonym" -> qPrivacyPseudonym,
    "q_privacy_forget" -> qPrivacyForget)

  val oracleSql: Map[String, String] = Map(
    "q_privacy_dpcount" ->
      """WITH c AS (
           SELECT lang, COUNT(*) AS n_true,
             CAST('0x' || substring(md5(lang || '#dp1'), 1, 6) AS INT)
               AS h
           FROM documents GROUP BY lang)
         SELECT lang, CAST(n_true
           + (CASE WHEN h >= 21902 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 65707 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 153316 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 328535 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 678973 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 1379849 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 2781601 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 5585104 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 11192111 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 13995614 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 15397366 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 16098242 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 16448680 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 16623899 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 16711508 THEN 1 ELSE 0 END)
           + (CASE WHEN h >= 16755313 THEN 1 ELSE 0 END)
           - 8 AS BIGINT) AS n_noisy
         FROM c""",
    "q_privacy_generalize" ->
      """WITH w AS (SELECT unnest([100, 200, 400, 800]) AS width),
         c AS (
           SELECT CAST(w.width AS BIGINT) AS width, lang,
             n_chars // w.width AS bucket, COUNT(*) AS k
           FROM documents, w GROUP BY 1, 2, 3),
         f AS (
           SELECT width, COUNT(*) AS n_classes,
             SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS n_below,
             COALESCE(SUM(k) FILTER (WHERE k < 5), 0) AS rows_suppressed,
             SUM(k) AS n_total, MIN(k) AS k_min
           FROM c GROUP BY 1)
         SELECT width, CAST(n_classes AS BIGINT) AS n_classes,
           CAST(n_below AS BIGINT) AS n_below,
           CAST(rows_suppressed AS BIGINT) AS rows_suppressed,
           CAST(k_min AS BIGINT) AS k_min,
           CAST((CAST(n_total - rows_suppressed AS HUGEINT) * 1000000)
             // n_total AS BIGINT) AS coverage_ppm,
           n_below = 0 AS k_anonymous
         FROM f ORDER BY width""",
    "q_privacy_forget" ->
      """WITH tomb AS (
           SELECT c_custkey FROM customer
           WHERE CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 4)
                 AS INT) % 20 = 0),
         doomed AS (
           SELECT t.c_custkey, o.o_orderkey
           FROM tomb t JOIN orders o ON o.o_custkey = t.c_custkey),
         no AS (
           SELECT c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM doomed GROUP BY c_custkey),
         ni AS (
           SELECT d.c_custkey, CAST(COUNT(*) AS BIGINT) AS n_lineitems
           FROM doomed d JOIN lineitem l ON l.l_orderkey = d.o_orderkey
           GROUP BY d.c_custkey)
         SELECT t.c_custkey,
           COALESCE(no.n_orders, 0) AS n_orders,
           COALESCE(ni.n_lineitems, 0) AS n_lineitems
         FROM tomb t
         LEFT JOIN no ON no.c_custkey = t.c_custkey
         LEFT JOIN ni ON ni.c_custkey = t.c_custkey
         ORDER BY t.c_custkey""",
    "q_privacy_pseudonym" ->
      """WITH cust AS (
           SELECT substring(sha256('p2024:' || CAST(c_custkey AS VARCHAR)),
                    1, 16) AS pid,
             c_mktsegment
           FROM customer),
         ord AS (
           SELECT substring(sha256('p2024:' || CAST(o_custkey AS VARCHAR)),
                    1, 16) AS pid,
             CAST(COUNT(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1)
         SELECT o.pid, c.c_mktsegment, o.n_orders
         FROM ord o JOIN cust c USING (pid)
         ORDER BY pid""",
    "q_privacy_tcloseness" ->
      """WITH cells AS (
           SELECT lang, n_chars // 200 AS len_bucket, source,
             COUNT(*) AS c
           FROM documents GROUP BY 1, 2, 3),
         gdist AS (
           SELECT source,
             SUM(SUM(c)) OVER (ORDER BY source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
             SUM(SUM(c)) OVER () AS n_total,
             COUNT(*) OVER () AS m
           FROM cells GROUP BY source),
         cl AS (
           SELECT lang, len_bucket, SUM(c) AS n_c FROM cells
           GROUP BY 1, 2),
         grid AS (
           SELECT cl.lang, cl.len_bucket, cl.n_c,
             g.source, g.cum_g, g.n_total, g.m,
             SUM(COALESCE(cells.c, 0)) OVER (
               PARTITION BY cl.lang, cl.len_bucket ORDER BY g.source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c
           FROM cl CROSS JOIN gdist g
           LEFT JOIN cells ON cells.lang = cl.lang
             AND cells.len_bucket = cl.len_bucket
             AND cells.source = g.source),
         agg AS (
           SELECT lang, len_bucket, n_c, n_total, m,
             SUM(abs(CAST(cum_c AS HUGEINT) * n_total
               - CAST(cum_g AS HUGEINT) * n_c)) AS emd_num
           FROM grid GROUP BY 1, 2, 3, 4, 5)
         SELECT lang, len_bucket, CAST(n_c AS BIGINT) AS n_c,
           CASE WHEN m > 1 THEN
             CAST((emd_num * 1000000)
               // ((m - 1) * CAST(n_c AS HUGEINT) * n_total) AS BIGINT)
           ELSE 0 END AS t_ppm,
           CASE WHEN m > 1 THEN
             CAST((emd_num * 1000000)
               // ((m - 1) * CAST(n_c AS HUGEINT) * n_total) AS BIGINT)
           ELSE 0 END <= 200000 AS t_close
         FROM agg ORDER BY lang, len_bucket""",
    "q_privacy_kanon" ->
      """WITH g AS (
           SELECT lang, n_chars // 200 AS len_bucket, source
           FROM documents)
         SELECT lang, len_bucket,
           CAST(COUNT(*) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS l_div,
           COUNT(*) >= 5 AS k_anonymous,
           COUNT(DISTINCT source) >= 2 AS l_diverse,
           (COUNT(*) >= 5 AND COUNT(DISTINCT source) >= 2) AS releasable
         FROM g GROUP BY lang, len_bucket
         ORDER BY lang, len_bucket""")
}
