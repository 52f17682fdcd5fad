package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Association / model-fit statistics, exact-integer style: the
  * "does X move with Y" layer next to [[AggQueries.qCorrSpearman]]
  * (rank correlation) and [[StatsOps]] (resampling + drift). All three
  * queries follow the house rules — sufficient statistics ride
  * decimal(38,0) (HUGEINT in the oracle), decisions are cross-multiplied
  * integer inequalities, and any float readout is a single identical
  * expression over the same exact integers in both engines (the
  * correctly-rounded-IEEE device [[AggQueries.qCorrSpearman]]
  * established), so the DuckDB oracle hash-matches bit-for-bit.
  *
  * Reference basis: the reference lands delay/weather series and leaves
  * "is delay growing with load, do the two feeds agree" to the humans
  * (dags/warsaw-delays.py:182-187); these are those judgments made
  * declarative.
  */
object AssociationOps {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)
  private def dec(c: Column) = c.cast(DecimalType(38, 0))

  private val cellCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  def clearArtifacts(): Unit = {
    cellCache.values.foreach(df => try df.unpersist(false)
      catch { case _: Throwable => () })
    cellCache.clear()
  }

  /** Session artifact: the (event_type, x, y) contingency cells
    * [[qCorrKendall]] folds — lazily checkpointed so the corpus scans
    * ONCE even though the tau-b plan consumes the cell table five times
    * (pair left/right, margins, x-ties, y-ties). Keyed by session
    * identity + corpus dir (a checkpointed frame is only valid inside
    * the session that built it — the [[QualityModel]] precedent). */
  private def kendallCells(s: SparkSession, d: String): DataFrame =
    Artifacts.memo(cellCache,
      s"${System.identityHashCode(s)}:$d:kendall", Artifacts.unpersistDf) {
      Tables.events(s, d)
        .select(col("event_type"),
          expr("CAST(floor(value / 50.0) AS BIGINT)").as("x"),
          expr("CAST(get_json_object(props, '$.k') AS BIGINT) div 10")
            .as("y"))
        .groupBy(col("event_type"), col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false) // lazy: materializes on first action,
      // then every consumer reads the ≤ |grid|·|types|-row cut lineage
    }

  /** Per-group OLS fit y = a + b·x (extendedprice on quantity, cents
    * grain, per returnflag): slope, intercept, and r² all derive from
    * ONE pass of five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    * in decimal(38,0); the final three readouts are float divisions of
    * those exact integers with the identical expression tree in DuckDB.
    *
    * Headroom: with x,y ≤ 10⁷ (cents of ≤10⁵), n·Σxy ≤ 10¹⁴·n² fits
    * decimal(38) to n ≈ 10¹² rows per group — the envelope is the
    * product grain, not the corpus. Past that, pre-aggregate x to a
    * coarser grain first (the [[AggQueries]] qAggSkew discipline).
    *
    * 100 TB shape: one map-side-combinable aggregate; the output is
    * |groups| rows. Nothing shuffles but partials. */
  val qRegrFit: Q = (s, d) => {
    val x = (col("l_quantity").cast(dec2) * 100).cast("long")
    val y = (col("l_extendedprice").cast(dec2) * 100).cast("long")
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * col("y")).as("sxy"),
        sum(dec(col("x")) * col("x")).as("sxx"),
        sum(dec(col("y")) * col("y")).as("syy"))
      .withColumn("num", dec(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", dec(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("deny", dec(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col("l_returnflag"), col("n"),
        (col("num").cast("double") / col("den").cast("double"))
          .as("slope"),
        ((col("sy").cast("double")
          - (col("num").cast("double") / col("den").cast("double"))
            * col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept"),
        (col("num").cast("double") * col("num").cast("double")
          / (col("den").cast("double") * col("deny").cast("double")))
          .as("r2"))
  }

  /** Kendall tau-b between event value and the props payload `k`, per
    * event type, at a DECLARED grid grain (value div 50 × k div 10 —
    * a 10×10 contingency grid): concordant/discordant mass comes from
    * the cell-pair product sum, tie corrections from the marginal
    * cells, and tau-b is the one float readout over those exact
    * integers. Binned tau IS the declared statistic (same device as
    * [[StatsOps.qDriftChisq]]'s declared windows): at corpus scale a
    * continuous tau needs all-pairs order statistics, while the grid
    * contracts the stream to ≤ |grid| cells per group and the pair
    * "join" runs over cells, not rows.
    *
    * 100 TB shape: ONE map-side rollup to ≤ 100 cells/group — the cell
    * table is a checkpointed session artifact ([[kendallCells]]) so the
    * five consumers (pair left/right, margins, both tie corrections)
    * read the contraction, not the corpus; the within-group cell
    * self-join touches ≤ 10⁴ cell pairs per group regardless of corpus
    * size. Counts ride decimal(38) — c_a·c_b is safe past 10¹⁸ rows per
    * cell. */
  val qCorrKendall: Q = (s, d) => {
    val cells = kendallCells(s, d)
    val a = cells.select(col("event_type"), col("x").as("xa"),
      col("y").as("ya"), col("c").as("ca"))
    val b = cells.select(col("event_type"), col("x").as("xb"),
      col("y").as("yb"), col("c").as("cb"))
    val pairs = a.join(b, Seq("event_type"))
      .filter(col("xa") < col("xb"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("ya") < col("yb"), dec(col("ca")) * col("cb"))
          .otherwise(dec(lit(0)))).as("nc"),
        sum(when(col("ya") > col("yb"), dec(col("ca")) * col("cb"))
          .otherwise(dec(lit(0)))).as("nd"))
    val margins = cells
      .groupBy(col("event_type"))
      .agg(sum(dec(col("c"))).as("n"))
    val tiesX = cells.groupBy(col("event_type"), col("x"))
      .agg(sum(col("c")).as("tx"))
      .groupBy(col("event_type"))
      .agg(sum(dec(col("tx")) * col("tx") - dec(col("tx"))).as("tx2"))
    val tiesY = cells.groupBy(col("event_type"), col("y"))
      .agg(sum(col("c")).as("ty"))
      .groupBy(col("event_type"))
      .agg(sum(dec(col("ty")) * col("ty") - dec(col("ty"))).as("ty2"))
    margins.join(pairs, "event_type")
      .join(tiesX, "event_type").join(tiesY, "event_type")
      // doubled grain throughout: n0d = n(n−1) = 2·n0, tx2 = 2·nx,
      // ty2 = 2·ny — the /2 cancels inside the tau-b ratio
      .withColumn("n0d", dec(col("n")) * col("n") - dec(col("n")))
      .select(col("event_type"), col("n").cast("long").as("n"),
        col("nc").cast("long").as("nc"), col("nd").cast("long").as("nd"),
        (lit(2.0) * (col("nc") - col("nd")).cast("double")
          / sqrt((col("n0d") - col("tx2")).cast("double")
            * (col("n0d") - col("ty2")).cast("double"))).as("tau_b"))
  }

  /** Two-sample Kolmogorov–Smirnov test (purchase vs view event
    * values) at a DECLARED unit-value grain: D·n₁·n₂ =
    * max |c₁·n₂ − c₂·n₁| over the binned CDFs is an exact integer, and
    * the α = 0.05 decision squares the classic critical inequality
    * D > 1.358·√((n₁+n₂)/(n₁·n₂)) into pure integer arithmetic —
    * d_num²·10⁴ > 18441·(n₁+n₂)·n₁·n₂ — so no sqrt ever happens.
    *
    * 100 TB shape: one map-side rollup to ≤ |value range| bins; the
    * cumulative window rides the bin contraction (≤ ~500 rows), not
    * the stream. Headroom: n₁,n₂ ≤ 10⁹ → d_num ≤ 10¹⁸, d_num² ≤ 10³⁶
    * inside decimal(38). */
  val qStatKs: Q = (s, d) => {
    val wCum = Window.orderBy("bin")
    val wAll = Window.partitionBy()
    Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "view"))
      .select(expr("CAST(floor(value) AS BIGINT)").as("bin"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
      .groupBy(col("bin"))
      .agg(sum(col("p")).as("o1"), sum(lit(1L) - col("p")).as("o2"))
      .withColumn("c1", sum(col("o1")).over(wCum))
      .withColumn("c2", sum(col("o2")).over(wCum))
      .withColumn("n1", sum(col("o1")).over(wAll))
      .withColumn("n2", sum(col("o2")).over(wAll))
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(dec(col("c1")) * col("n2") - dec(col("c2")) * col("n1")))
        .as("d_num"))
      .select(col("n1"), col("n2"),
        col("d_num").cast("long").as("d_num"),
        expr("CAST((d_num * 1000) div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
          .as("d_milli"),
        (dec(col("d_num")) * col("d_num") * lit(10000) >
          dec(lit(18441)) * (col("n1") + col("n2")) * col("n1") * col("n2"))
          .as("rejected"))
  }

  /** Market-basket association rules (Agrawal et al. 1993's
    * support/confidence plus lift) over order baskets: for every part
    * pair co-ordered in ≥ `MinSupport` baskets, the pair support and
    * both directed confidences + the symmetric lift as exact ppm
    * rationals (supp_ab·10⁶ div supp_a; N·supp_ab·10⁶ div
    * (supp_a·supp_b) in decimal(38) — headroom past 10¹² baskets).
    * N rides a 1-row rollup broadcast-cross-joined in (keeps plan
    * construction job-free, unlike a collected scalar).
    *
    * 100 TB shape: baskets contract to distinct (order, item) pairs
    * map-side; the A-Priori prune then runs BEFORE pair generation — an
    * inner join against the frequent-item set (s ≥ MinSupport) shrinks
    * BOTH inputs of the order-key self-join, because an infrequent item
    * can never participate in a frequent pair (the downward-closure
    * lemma), so results are provably identical under the same oracle.
    * The prune join doubles as the support lookup: it CARRIES s, so the
    * pair rollup picks up sa/sb with first() (constant per (a,b) group)
    * and no post-rollup joins exist at all — the prune is free, not an
    * extra pass. The pruned self-join clusters on ok (one exchange each
    * side); the shuffle payload grows by two longs per pair partial.
    * The prune join deliberately carries NO broadcast hint: under the
    * absolute MinSupport the frequent-item set converges to nearly the
    * whole item catalog, which scales with the corpus (part = 200k×SF
    * in TPC-H) — forcing a broadcast there is the same Heaps'-law
    * hazard as a corpus vocabulary. The join is item-keyed, so the
    * shuffled form is one exchange; AQE still broadcasts at runtime
    * whenever freq genuinely fits.
    *
    * r18 A/B, ACCEPTED THEN REVERTED after a final-plan audit: an
    * up-front repartition(item) — intended to let the distinct, the
    * frequent-set rollup and the prune join share one item exchange —
    * measured ~2.3× at the 10× mirror (2.3–3.0 s vs 5.1–9.7), but
    * graft.tools.ExplainFinal showed the runtime plan planned the
    * repartitioned subtree FOUR times un-reused (the consumers prune
    * different columns below the exchange, so canonical equality — and
    * with it ReuseExchange, which dedupes the CURRENT form's distinct
    * exchange across its three consumers — is destroyed). The entire
    * mirror win was the repartition handing the single-row-group
    * fixture scan 32-way parallelism (the r17-ruled-out
    * repartition-after-scan device in disguise); at real scale it
    * shuffles the stream 4× where this form shuffles it once. The
    * ReuseExchange-deduped distinct stands. */
  val MinSupport = 2L

  val qBasketRules: Q = (s, d) => {
    val allItems = Tables.lineitem(s, d)
      .filter(col("l_linenumber") <= 3)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
    val freq = allItems.groupBy(col("item")).agg(count(lit(1)).as("s"))
      .filter(col("s") >= MinSupport)
    val n = allItems.select(countDistinct(col("ok")).as("n_baskets"))
    val withS = allItems.join(freq, "item")
    // the ok self-join is pinned SHUFFLE_HASH: without a strategy hint
    // Catalyst's size-only estimator can decide the joined withS frame
    // is broadcastable and build a corpus-scale hash relation (measured
    // +87% at sf0.1, an OOM at lake scale); a shuffle hint is scale-safe
    // by construction — both sides hash on ok and the identical subtree
    // is planned once
    val pairs = withS
      .select(col("ok"), col("item").as("a"), col("s").as("sa"))
      .join(withS.select(col("ok"), col("item").as("b"), col("s").as("sb"))
        .hint("shuffle_hash"),
        "ok")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("supp_ab"),
        first(col("sa")).as("sa"), first(col("sb")).as("sb"))
      .filter(col("supp_ab") >= MinSupport)
    pairs
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("supp_ab"),
        expr("(supp_ab * 1000000) div sa").as("conf_ab_ppm"),
        expr("(supp_ab * 1000000) div sb").as("conf_ba_ppm"),
        expr("CAST((CAST(n_baskets AS DECIMAL(38,0)) * supp_ab * 1000000)" +
          " div (CAST(sa AS DECIMAL(38,0)) * sb) AS LONG)").as("lift_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_regr_fit" -> qRegrFit,
    "q_corr_kendall" -> qCorrKendall,
    "q_stat_ks" -> qStatKs,
    "q_basket_rules" -> qBasketRules)

  val oracleSql: Map[String, String] = Map(
    "q_basket_rules" ->
      """WITH items AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
           FROM lineitem WHERE l_linenumber <= 3),
         supp AS (SELECT item, COUNT(*) AS s FROM items GROUP BY item),
         n AS (SELECT COUNT(DISTINCT ok) AS n_baskets FROM items),
         pairs AS (
           SELECT a.item AS a, b.item AS b, COUNT(*) AS supp_ab
           FROM items a JOIN items b
             ON a.ok = b.ok AND a.item < b.item
           GROUP BY 1, 2 HAVING COUNT(*) >= 2)
         SELECT p.a, p.b, p.supp_ab,
           (p.supp_ab * 1000000) // sa.s AS conf_ab_ppm,
           (p.supp_ab * 1000000) // sb.s AS conf_ba_ppm,
           CAST((CAST(n.n_baskets AS HUGEINT) * p.supp_ab * 1000000)
             // (CAST(sa.s AS HUGEINT) * sb.s) AS BIGINT) AS lift_ppm
         FROM pairs p
           JOIN supp sa ON p.a = sa.item
           JOIN supp sb ON p.b = sb.item
           CROSS JOIN n
         ORDER BY p.a, p.b""",
    "q_regr_fit" ->
      """WITH s AS (
           SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM lineitem),
         agg AS (
           SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx,
             SUM(CAST(y AS HUGEINT) * y) AS syy
           FROM s GROUP BY l_returnflag),
         k AS (
           SELECT l_returnflag, n,
             CAST(n AS HUGEINT) * sxy - sx * sy AS num,
             CAST(n AS HUGEINT) * sxx - sx * sx AS den,
             CAST(n AS HUGEINT) * syy - sy * sy AS deny,
             sx, sy
           FROM agg)
         SELECT l_returnflag, n,
           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope,
           (CAST(sy AS DOUBLE)
             - (CAST(num AS DOUBLE) / CAST(den AS DOUBLE))
               * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
           CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
             / (CAST(den AS DOUBLE) * CAST(deny AS DOUBLE)) AS r2
         FROM k ORDER BY l_returnflag""",
    "q_corr_kendall" ->
      """WITH cells AS (
           SELECT event_type,
             CAST(floor(value / 50.0) AS BIGINT) AS x,
             CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS y,
             COUNT(*) AS c
           FROM events GROUP BY 1, 2, 3),
         pairs AS (
           SELECT a.event_type,
             SUM(CASE WHEN a.y < b.y
               THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS nc,
             SUM(CASE WHEN a.y > b.y
               THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS nd
           FROM cells a JOIN cells b
             ON a.event_type = b.event_type AND a.x < b.x
           GROUP BY a.event_type),
         m AS (
           SELECT event_type, SUM(CAST(c AS HUGEINT)) AS n FROM cells
           GROUP BY event_type),
         tx AS (
           SELECT event_type,
             SUM(CAST(tx AS HUGEINT) * tx - tx) AS tx2
           FROM (SELECT event_type, x, SUM(c) AS tx FROM cells
                 GROUP BY event_type, x)
           GROUP BY event_type),
         ty AS (
           SELECT event_type,
             SUM(CAST(ty AS HUGEINT) * ty - ty) AS ty2
           FROM (SELECT event_type, y, SUM(c) AS ty FROM cells
                 GROUP BY event_type, y)
           GROUP BY event_type)
         SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           CAST(pairs.nc AS BIGINT) AS nc, CAST(pairs.nd AS BIGINT) AS nd,
           2.0 * CAST(pairs.nc - pairs.nd AS DOUBLE)
             / sqrt(CAST(m.n * m.n - m.n - tx.tx2 AS DOUBLE)
               * CAST(m.n * m.n - m.n - ty.ty2 AS DOUBLE)) AS tau_b
         FROM m JOIN pairs USING (event_type)
           JOIN tx USING (event_type) JOIN ty USING (event_type)
         ORDER BY m.event_type""",
    "q_stat_ks" ->
      """WITH b AS (
           SELECT CAST(floor(value) AS BIGINT) AS bin,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS o1,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS o2
           FROM events WHERE event_type IN ('purchase', 'view')
           GROUP BY 1),
         c AS (
           SELECT bin,
             SUM(o1) OVER (ORDER BY bin) AS c1,
             SUM(o2) OVER (ORDER BY bin) AS c2,
             SUM(o1) OVER () AS n1, SUM(o2) OVER () AS n2
           FROM b),
         dm AS (
           SELECT n1, n2,
             MAX(abs(CAST(c1 AS HUGEINT) * n2 - CAST(c2 AS HUGEINT) * n1))
               AS d_num
           FROM c GROUP BY n1, n2)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(d_num AS BIGINT) AS d_num,
           CAST((d_num * 1000) // (CAST(n1 AS HUGEINT) * n2) AS BIGINT)
             AS d_milli,
           CAST(d_num AS HUGEINT) * d_num * 10000 >
             CAST(18441 AS HUGEINT) * (n1 + n2) * n1 * n2 AS rejected
         FROM dm""")
}
