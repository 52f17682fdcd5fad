package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{ArrayType, DecimalType, IntegerType, StringType}
import graft.Tables

/** Aggregations, grouping analytics, window functions (SURVEY.md §2.2).
  *
  * Determinism (SURVEY.md §7.4): SUM/AVG of doubles always go through a
  * DecimalType cast — float addition is order-dependent across partitions
  * and engines, decimal is exact. Averages are written as
  * `sum(decimal) / count` and cast to a fixed scale in BOTH engines.
  *
  * Output-type rule (round-2 driver-gate fix): decimals are INTERNAL only;
  * every final decimal column is cast to DOUBLE in both Spark and the
  * oracle. The driver reads our parquet through pandas (decimal128 →
  * Python Decimal, str '101951.00') but the oracle through
  * duckdb.fetch_df (→ float64, str '101951.0'), so decimal outputs with
  * trailing fraction zeros hash-mismatch even when values are identical.
  * Exact-decimal → double conversion is correctly rounded in both engines
  * (unscaled < 2^53 at our scales), so equal decimals give bit-equal
  * doubles and identical strings.
  *
  * Scale notes: every groupBy here is Spark's two-phase hash aggregate
  * (partial map-side combine → shuffle on the group key → final), which is
  * the right plan at 100 TB; nothing below forces a global single-partition
  * stage except the final presentation `orderBy` (bounded output).
  */
object AggQueries {

  type Q = (SparkSession, String) => DataFrame

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)
  private val dec6 = DecimalType(18, 6)

  /** Flagship TPC-H-Q1-style rollup per (returnflag, linestatus) — scan →
    * decimal cast → hash agg → sort, the minimum end-to-end Catalyst slice
    * (SURVEY.md §7.2 step 1). Consumer query of the reference's
    * traffic/ hourly layout (dags/warsaw-delays.py:194). */
  val qAggGroup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity").cast(dec2)).cast(dec2).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec2)).cast(dec2).cast("double").as("sum_price"),
        (sum(col("l_discount").cast(dec4)) / count(lit(1))).cast(dec6).cast("double").as("avg_disc"))

  /** COUNT(DISTINCT) per group — Catalyst's expand + two-phase distinct
    * aggregate. Reference basis: dedupe-by-hash intent
    * (dags/warsaw-gtfs.py:60-71). */
  val qAggDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))

  /** Multiple distinct aggregates in one pass (Catalyst Expand plan) +
    * FILTER-style conditional aggregates. */
  val qAggMultiDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("du"),
        countDistinct(col("k")).as("dk"),
        count(when(col("value") > 100, 1)).as("n_big"),
        sum(when(col("k") > 50, col("value").cast(dec2))).cast(dec2)
          .cast("double").as("sum_bigk"))

  /** HLL++ approximate distinct — the 100 TB path for distinct counts
    * (constant memory per partition vs. expand shuffle). No oracle: sketch
    * estimates are engine-specific (SURVEY.md §2.2). */
  val qAggApproxDistinct: Q = (s, d) =>
    Tables.events(s, d)
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))

  /** Incremental distinct-count STATE — the warehouse pattern behind
    * every "daily uniques, updated hourly" dashboard at 100 TB: per
    * (event_type, day) slice, persist ONE DataSketches HLL sketch row
    * (`hll_sketch_agg`, binary, mergeable); the rollup is
    * `hll_union_agg` over sketch rows — bytes-per-slice work, the raw
    * events never rescan. New slices append sketch rows; history stays
    * immutable. Estimates are deterministic functions of the input (no
    * oracle only because DuckDB's HLL is a different sketch
    * implementation); NoOracleSpec pins merged-vs-direct equality and
    * the error envelope vs exact distinct. */
  val qAggHllMerge: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)")
        .as("approx_users"),
        count(lit(1)).as("n_slices"))

  /** Count-min sketch dimensions: DEPTH independent hash rows of WIDTH
    * buckets. Error bound: overshoot ≤ e/WIDTH · N with probability
    * 1 − e^−DEPTH per key (Cormode & Muthukrishnan 2005). */
  private val CmsDepth = 4
  private val CmsWidth = 512

  /** Count-min sketch CELLS over `key`: a (r, b, n) DataFrame — row r's
    * bucket b holds the count of occurrences hashing there
    * (xxhash64 seeded per row — fully codegen'd, no UDF). The sketch IS
    * a table, so merging is union + re-sum per (r, b): each ingest batch
    * appends its own cells and the rollup touches DEPTH·WIDTH rows per
    * batch, never the raw events — same warehouse shape as
    * [[qAggHllMerge]] but for per-key FREQUENCIES rather than distinct
    * counts. */
  def cmsCells(df: DataFrame, key: Column): DataFrame =
    df.select(posexplode(array((0 until CmsDepth).map(r =>
        pmod(xxhash64(key, lit(r)), lit(CmsWidth.toLong))): _*))
        .as(Seq("r", "b")))
      .groupBy("r", "b").agg(count(lit(1)).as("n"))

  /** Point estimates from CMS cells for a 1-column `k` keys frame: each
    * key probes its DEPTH cells and takes the MIN — one-sided error,
    * estimate ≥ true count always. An ABSENT cell row means nothing
    * hashed there, i.e. count 0 — hence the left join + coalesce: a
    * never-ingested key whose probes include one empty cell estimates
    * exactly 0 (an inner join would instead min over only its colliding
    * cells and overstate). The cells frame is ≤ DEPTH·WIDTH rows
    * regardless of data size, so the lookup broadcasts; the final min
    * groupBy reuses the keys frame's k-partitioning (posexplode
    * preserves it through the broadcast join), keeping the whole
    * estimate plan at the keys frame's own exchange count. */
  def cmsEstimates(cells: DataFrame, keys: DataFrame): DataFrame =
    keys
      .select(col("k"), posexplode(array((0 until CmsDepth).map(r =>
          pmod(xxhash64(col("k"), lit(r)), lit(CmsWidth.toLong))): _*))
          .as(Seq("r", "b")))
      .join(broadcast(cells), Seq("r", "b"), "left")
      .groupBy("k").agg(min(coalesce(col("n"), lit(0L))).as("est_n"))

  /** CMS build + probe over event_type — per-key frequency estimation
    * in constant sketch memory, the third sketch alongside HLL
    * (distincts) and freqItems (hot keys). Deterministic given the
    * seeded hash family, but the family is Spark's xxhash64 → no-oracle
    * sketch class; NoOracleSpec pins the one-sided guarantee
    * (estimate ≥ exact, exact when key cardinality ≪ WIDTH leaves the
    * rows collision-free) and cell mergeability (slice-built cells
    * re-summed ≡ cells built in one pass). */
  val qAggCms: Q = (s, d) => {
    val ev = Tables.events(s, d)
    cmsEstimates(cmsCells(ev, col("event_type")),
      ev.select(col("event_type").as("k")).distinct())
  }

  /** Single-pass frequent-items sketch (heavy hitters) — the hot-key
    * PROBE that feeds the salting machinery: before landing a
    * table-scale join/agg, one constant-memory pass surfaces every key
    * whose frequency exceeds the support threshold (with possible false
    * positives, never false negatives — the superset guarantee
    * NoOracleSpec pins against exact counts), and the surfaced keys are
    * what q_agg_salted/q_join_salted then salt. At 100 TB the exact
    * groupBy-count alternative is itself the skewed shuffle being
    * avoided. Arrays sorted + joined for stable presentation; no oracle
    * (sketch contents are engine/partition-order specific). */
  val qAggFreqItems: Q = (s, d) =>
    Tables.events(s, d)
      .stat.freqItems(Array("event_type", "user_id"), 0.1)
      .select(
        array_join(array_sort(col("event_type_freqItems")
          .cast(ArrayType(StringType))), " ").as("freq_event_types"),
        size(col("user_id_freqItems")).as("n_freq_users"))

  /** ROLLUP over the region→nation hierarchy — the YYYY/MM/DD date
    * hierarchy analog (dags/warsaw-gtfs.py:90). */
  val qAggRollup: Q = (s, d) =>
    Tables.nation(s, d)
      .rollup(col("n_regionkey"), col("n_nationkey"))
      .agg(count(lit(1)).as("n"))

  /** CUBE over (event_type, user parity). */
  val qAggCube: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("parity"),
        col("value"))
      .cube(col("event_type"), col("parity"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(dec2)).cast(dec2).cast("double").as("sum_value"))

  /** Explicit GROUPING SETS with grouping() markers (SQL surface). */
  val qAggGroupingSets: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("gs_lineitem")
    s.sql("""SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INT) AS g1,
        CAST(grouping(l_linestatus) AS INT) AS g2,
        COUNT(*) AS n
      FROM gs_lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
  }

  /** Pivot: hour-of-day × event_type count matrix, with the pivot value
    * list seeded (no extra distinct pass — mandatory at scale). Null cells
    * → 0 to match COUNT FILTER oracle semantics. */
  val qPivot: Q = (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .select(hour(col("ts")).as("hr"), col("event_type"))
      .groupBy(col("hr"))
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
  }

  /** Correlation / covariance via exact sufficient statistics — the
    * two-variable sibling of [[qAggStats]]: per returnflag, the sample
    * covariance of quantity and price is a pure decimal expression
    * ((n·Σxy − Σx·Σy) / (n·(n−1)), exact, order-independent), and
    * Pearson r divides the same exact numerator by
    * sqrt(denx·deny) — three IEEE ops (mul, sqrt, div) on
    * exactly-represented inputs, bit-identical across engines because
    * the oracle performs the identical op sequence. Never
    * corr()/covar_samp() built-ins when results must be
    * partition-count-independent: their float accumulation is
    * order-dependent. One map-side-combinable pass. */
  val qAggCorr: Q = (s, d) => {
    // quantity vs discount: BOUNDED per-row magnitudes (x ≤ 50,
    // y ≤ 0.10), so the moment sums stay small enough for the oracle's
    // 128-bit decimals at any gate scale; correlating unbounded columns
    // (price²) overflows DECIMAL(18,4) at sf0.1 already — the Spark
    // side rides DECIMAL(28,_) for petabyte headroom regardless
    val x = col("l_quantity").cast(dec2)
    val y = col("l_discount").cast(dec2)
    val w2 = DecimalType(28, 2)
    val w4 = DecimalType(28, 4)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(w2).as("sx"), sum(y).cast(w2).as("sy"),
        sum(x * x).cast(w4).as("sxx"), sum(y * y).cast(w4).as("syy"),
        sum(x * y).cast(w4).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy"))
          / (col("n") * (col("n") - 1)))
          .cast(dec6).cast("double").as("covar_qty_disc"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))
          .as("corr_qty_disc"))
  }

  /** Spearman rank correlation (quantity vs extended price per return
    * flag) — the robust, monotone-relationship sibling of [[qAggCorr]]
    * that unbounded columns NEED: ranks are bounded by n no matter how
    * wild the values, so price can participate where Pearson's price²
    * moments overflow. Exact throughout: ties take the average rank as
    * the DOUBLED integer `2·rank() + ties − 1` (rank R over t tied
    * positions averages R + (t−1)/2), and Spearman = Pearson over the
    * doubled ranks via the same n·Σxy − Σx·Σy sufficient-stats device —
    * one sqrt over identically-rounded exact doubles at the end.
    * Headroom: r₂ ≤ 2n so n·Σ(r₂ᵃr₂ᵇ) ≤ 4n⁴ — decimal(38)/HUGEINT to
    * n ≈ 10⁹ rows per group; past that, pre-aggregate (the qAggCorr
    * boundedness note).
    *
    * Scale shape: two flag-keyed rank windows share ONE sort/exchange
    * of (flag, x, y) triples, then the same map-side-combinable moment
    * rollup as every stats query. */
  val qCorrSpearman: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy("l_returnflag").orderBy("x")
    val wtx = Window.partitionBy("l_returnflag", "x")
    val wy = Window.partitionBy("l_returnflag").orderBy("y")
    val wty = Window.partitionBy("l_returnflag", "y")
    val w38 = DecimalType(38, 0)
    def dec(c: org.apache.spark.sql.Column) = c.cast(w38)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        (col("l_quantity").cast(dec2) * 100).cast("long").as("x"),
        (col("l_extendedprice").cast(dec2) * 100).cast("long").as("y"))
      .withColumn("ra",
        lit(2) * rank().over(wx) + count(lit(1)).over(wtx) - 1)
      .withColumn("rb",
        lit(2) * rank().over(wy) + count(lit(1)).over(wty) - 1)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("ra"))).as("sa"), sum(dec(col("rb"))).as("sb"),
        sum(dec(col("ra")) * col("ra")).as("saa"),
        sum(dec(col("rb")) * col("rb")).as("sbb"),
        sum(dec(col("ra")) * col("rb")).as("sab"))
      .select(col("l_returnflag"), col("n"),
        ((dec(col("n")) * col("sab") - col("sa") * col("sb")).cast("double")
          / sqrt((dec(col("n")) * col("saa") - col("sa") * col("sa"))
              .cast("double")
            * (dec(col("n")) * col("sbb") - col("sb") * col("sb"))
              .cast("double"))).as("spearman"))
  }

  /** Pivot with MULTIPLE aggregates per cell: hour-of-day × event_type
    * matrix carrying both the count and the exact decimal value sum —
    * Spark names the columns `{pivotValue}_{aggAlias}`; the oracle
    * states the same matrix as FILTERed aggregates. Missing count cells
    * zero-fill; missing sums stay NULL (no events ⇒ no sum) in both
    * engines. */
  val qPivotMulti: Q = (s, d) => {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .select(hour(col("ts")).as("hr"), col("event_type"),
        col("value").cast(dec2).as("v"))
      .groupBy(col("hr"))
      .pivot("event_type", types)
      .agg(count(lit(1)).as("n"),
        sum(col("v")).cast(dec2).cast("double").as("sum"))
      .na.fill(0L, types.map(_ + "_n"))
  }

  // ---- window functions -------------------------------------------------

  /** rank / dense_rank / row_number per customer by price (unique
    * tiebreak → all three deterministic). Reference basis: pagination row
    * indexing (dags/warsaw-delays.py:106,130). */
  val qWindowRank: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
  }

  /** Running (cumulative) sum per user over event time — the cumulative
    * all_rows accumulation (dags/warsaw-delays.py:157,167). */
  val qWindowRunning: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(dec2)).over(w).cast(dec2).cast("double").as("running"))
  }

  /** 3-row centered moving average per user (frame-spec surface); written
    * as windowed sum/count so the decimal division is explicit in both
    * engines. */
  val qWindowMoving: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-1, 1)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        (sum(col("value").cast(dec2)).over(w) / count(lit(1)).over(w))
          .cast(dec6).cast("double").as("mavg"))
  }

  /** RANGE frame over event time: per user, decimal sum of the trailing
    * hour (value-based frame bounds — peers included — vs the ROWS frames
    * above). Frame arithmetic runs on unix µs in both engines. */
  val qWindowRangeFrame: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L) // trailing 1 hour in µs
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        sum(col("value").cast(dec2)).over(w).cast(dec2).cast("double").as("hour_sum"))
  }

  /** lag/lead: per-user delta vs previous value, next event type. The
    * delta is a single IEEE-754 subtraction — bit-deterministic in both
    * engines (no reordering), so doubles are safe here. */
  val qWindowLag: Q = (s, d) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"),
        lead(col("event_type"), 1).over(w).as("next_type"))
  }

  /** Top-3 orders per customer via row_number ≤ 3 — the page-size cap
    * pattern (dags/warsaw-delays.py:168). */
  val qTopkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
  }

  /** Statistical aggregates via exact sufficient statistics: per
    * returnflag, n / Σx / Σx² accumulate in DECIMAL (exact, order
    * independent), sample variance = (n·Σx² − (Σx)²) / (n·(n−1)) through
    * the same decimal-division-then-fixed-scale pattern as avg_disc, and
    * stddev = sqrt(variance) — IEEE sqrt is correctly rounded, so equal
    * variances give bit-equal stddevs. The point at 100 TB: moments are
    * one map-side-combinable pass; never use float stddev_samp/var_samp
    * when results must be partition-count-independent. */
  val qAggStats: Q = (s, d) => {
    val q = col("l_quantity").cast(dec2)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).cast(dec2).as("s"),
        sum(q * q).cast(dec4).as("ss"))
      .select(col("l_returnflag"), col("n"),
        col("s").cast("double").as("sum_qty"),
        col("ss").cast("double").as("sumsq_qty"),
        ((col("n") * col("ss") - col("s") * col("s"))
          / (col("n") * (col("n") - 1))).cast(dec6).cast("double").as("var_qty"))
      .withColumn("std_qty", sqrt(col("var_qty")))
  }

  /** Skewness via exact integer central sums — the third-moment sibling
    * of [[qAggStats]]/[[qAggCorr]]: per returnflag, the mean-centered
    * residual cross-multiplied by n (`c = n·q − S`) is an exact integer,
    * so A2 = Σc² and A3 = Σc³ accumulate exactly in decimal; the
    * standardized skew g1 = A3 / √(A2³/n) then costs three
    * correctly-rounded IEEE ops (*, /, sqrt) on identically-rounded
    * inputs — bit-equal cross-engine, never skewness()'s float
    * accumulation. Bounded column (quantity ≤ 50, centi-units ≤ 5000):
    * |c| ≤ n·5000, so one c³ term is ≤ 1.25e11·n³ (already past
    * DECIMAL(38) max ~1e38 at n = 10⁹) and the worst-case |A3| ≤
    * 1.25e11·n⁴ — the safe envelope is n ≲ 1.5e8 rows per group; past
    * that, pre-aggregate per partition key first (the qAggCorr
    * boundedness note). Two passes over the group stats — the fact scan
    * feeds a 3-row broadcast back in. */
  val qAggSkew: Q = (s, d) => {
    val q = (col("l_quantity").cast(dec2) * lit(100)).cast("long")
    val base = Tables.lineitem(s, d)
      .select(col("l_returnflag"), q.as("q"))
    val stats = base.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sl"))
    def dec19(c: Column) = c.cast("decimal(19,0)")
    base.join(broadcast(stats), "l_returnflag")
      .withColumn("c", dec19(col("n")) * dec19(col("q")) - dec19(col("sl")))
      .groupBy(col("l_returnflag"))
      .agg(first(col("n")).as("n"),
        sum(col("c") * col("c")).as("a2"),
        sum(col("c") * col("c") * col("c")).as("a3"))
      .select(col("l_returnflag"), col("n"),
        col("a2").cast("double").as("a2"),
        col("a3").cast("double").as("a3"))
      // a2 = 0 (constant group) → NULL, matching DuckDB's NULL on
      // float /0 rather than Spark's NaN
      .withColumn("skew",
        when(col("a2") === 0.0, lit(null).cast("double"))
          .otherwise(col("a3") / sqrt(col("a2") * col("a2") * col("a2")
            / col("n").cast("double"))))
  }

  /** Fixed-width histogram: bucket = floor(value / 10) per event type.
    * floor(x/10) is one correctly-rounded IEEE divide + floor in both
    * engines — deterministic without decimals. Map-side bucket projection
    * + one grouped count; the 100 TB histogram is this exact plan. */
  val qAggHistogram: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), floor(col("value") / 10).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Per-group mode with a deterministic tie-break (most frequent
    * o_orderpriority per status; ties → lexicographically smallest).
    * Spark's native `mode()` leaves ties unspecified, so the engine rule
    * is count → row_number window — same two-shuffle plan, reproducible
    * output. */
  val qAggMode: Q = (s, d) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("cnt").desc, col("o_orderpriority").asc)
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("cnt"))
  }

  /** Approximate percentiles (KLL-style sketch, `approx_percentile`) —
    * the 100 TB path for quantiles: constant sketch memory per partition
    * + merge, vs the exact percentile's full sort. No oracle (sketch
    * internals are engine-specific); NoOracleSpec bounds the rank error
    * against the exact quantiles. */
  val qAggApproxPercentile: Q = (s, d) =>
    Tables.events(s, d)
      .agg(approx_percentile(col("value"), array(lit(0.5), lit(0.9)), lit(10000))
        .as("p50_p90"))

  /** Frame-navigation window functions: first/last/nth event type per
    * user trace, one output row per user (rn = 1 filter over the same
    * window pass — no second aggregation). `first`/`last`/`nth_value`
    * read a full-partition ROWS frame over the (ts, event_id) total
    * order, so every value is tie-deterministic. One user-keyed
    * exchange; per-row state is O(1). */
  val qWindowNth: Q = (s, d) => {
    val ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"),
        row_number().over(ord).as("rn"),
        first(col("event_type")).over(full).as("first_type"),
        last(col("event_type")).over(full).as("last_type"),
        nth_value(col("event_type"), 2).over(full).as("second_type"))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("first_type"), col("last_type"),
        col("second_type"))
  }

  /** Exact distinct-user counts via mergeable roaring-style bitmaps
    * (`bitmap_bucket_number`/`bitmap_bit_position`/`bitmap_construct_agg`
    * /`bitmap_count`): the scale path for exact COUNT(DISTINCT) — the
    * inner aggregate is map-side combinable per (group, bucket) with
    * fixed 4 KiB bitmap partials, and the outer SUM over bucket counts
    * is trivially mergeable, so no row-level expand/distinct shuffle of
    * the kind `count_distinct` plans. Bitmap state is also storable,
    * making the count incrementally maintainable across snapshots
    * (unlike HLL, with no approximation). Oracle = plain
    * COUNT(DISTINCT): the bitmap pipeline must be indistinguishable
    * from it. */
  val qAggBitmapDistinct: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("bm_events")
    s.sql(
      """SELECT event_type, CAST(SUM(bitmap_count(b)) AS BIGINT) AS n_users
        |FROM (SELECT event_type,
        |             bitmap_bucket_number(user_id) AS bkt,
        |             bitmap_construct_agg(bitmap_bit_position(user_id)) AS b
        |      FROM bm_events
        |      GROUP BY event_type, bitmap_bucket_number(user_id))
        |GROUP BY event_type""".stripMargin)
  }

  /** Weighted percentiles (median + P90) of extended price weighted by
    * quantity, per return flag — EXACT: prices collapse to an integer-
    * cent histogram first (map-side combine), weights ride integer
    * deci-units, and the p-th weighted percentile is the smallest price
    * whose cumulative weight crosses p·W, decided by the cross-
    * multiplied integer tests `2·cumw ≥ W` / `10·cumw ≥ 9·W` — no
    * interpolation, no floats. The windows run over the per-flag price
    * histogram, never the raw fact rows. */
  val qAggWeightedPercentile: Q = (s, d) => {
    val hist = Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast(dec2) * lit(100)).cast("long")
          .as("price_c"),
        (col("l_quantity").cast(dec2) * lit(10)).cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("price_c"))
      .agg(sum(col("w")).as("w"))
    val wo = Window.partitionBy("l_returnflag").orderBy("price_c")
    val full = wo.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    hist
      .withColumn("cumw", sum(col("w")).over(
        wo.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("totw", sum(col("w")).over(full))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cumw") * 2 >= col("totw"), col("price_c")))
          .as("wmedian_c"),
        min(when(col("cumw") * 10 >= col("totw") * 9, col("price_c")))
          .as("wp90_c"),
        first(col("totw")).as("total_w"))
  }

  // ---- registry ---------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "q_agg_weighted_percentile" -> qAggWeightedPercentile,
    "q_agg_skew" -> qAggSkew,
    "q_agg_stats" -> qAggStats,
    "q_agg_histogram" -> qAggHistogram,
    "q_agg_mode" -> qAggMode,
    "q_agg_approx_percentile" -> qAggApproxPercentile,
    "q_agg_group" -> qAggGroup,
    "q_agg_distinct" -> qAggDistinct,
    "q_agg_multi_distinct" -> qAggMultiDistinct,
    "q_agg_approx_distinct" -> qAggApproxDistinct,
    "q_agg_hll_merge" -> qAggHllMerge,
    "q_agg_cms" -> qAggCms,
    "q_agg_freq_items" -> qAggFreqItems,
    "q_agg_rollup" -> qAggRollup,
    "q_agg_cube" -> qAggCube,
    "q_agg_grouping_sets" -> qAggGroupingSets,
    "q_pivot" -> qPivot,
    "q_pivot_multi" -> qPivotMulti,
    "q_agg_corr" -> qAggCorr,
    "q_corr_spearman" -> qCorrSpearman,
    "q_window_rank" -> qWindowRank,
    "q_window_running" -> qWindowRunning,
    "q_window_moving" -> qWindowMoving,
    "q_window_lag" -> qWindowLag,
    "q_window_range_frame" -> qWindowRangeFrame,
    "q_window_nth" -> qWindowNth,
    "q_agg_bitmap_distinct" -> qAggBitmapDistinct,
    "q_topk_per_group" -> qTopkPerGroup)

  val oracleSql: Map[String, String] = Map(
    "q_agg_skew" ->
      """WITH b AS (
           SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q
           FROM lineitem),
         st AS (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(q) AS BIGINT) AS sl
           FROM b GROUP BY 1),
         cs AS (
           SELECT b.l_returnflag, st.n,
             CAST(st.n AS HUGEINT) * b.q - st.sl AS c
           FROM b JOIN st USING (l_returnflag))
         SELECT l_returnflag, CAST(MIN(n) AS BIGINT) AS n,
           CAST(SUM(c * c) AS DOUBLE) AS a2,
           CAST(SUM(c * c * c) AS DOUBLE) AS a3,
           CAST(SUM(c * c * c) AS DOUBLE)
             / sqrt(CAST(SUM(c * c) AS DOUBLE) * CAST(SUM(c * c) AS DOUBLE)
                    * CAST(SUM(c * c) AS DOUBLE) / CAST(MIN(n) AS DOUBLE))
             AS skew
         FROM cs GROUP BY l_returnflag""",
    "q_agg_weighted_percentile" ->
      """WITH h AS (
           SELECT l_returnflag,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_c,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 10
               AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
         r AS (
           SELECT l_returnflag, price_c, w,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cumw,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag)
               AS BIGINT) AS totw
           FROM h)
         SELECT l_returnflag,
           MIN(CASE WHEN cumw * 2 >= totw THEN price_c END) AS wmedian_c,
           MIN(CASE WHEN cumw * 10 >= totw * 9 THEN price_c END)
             AS wp90_c,
           CAST(MIN(totw) AS BIGINT) AS total_w
         FROM r GROUP BY l_returnflag""",
    "q_agg_stats" ->
      """WITH a AS (
           SELECT l_returnflag, COUNT(*) AS n,
             -- width 19: DuckDB multiplies width-<=18 decimals in int64
             -- and OVERFLOWS at sf1 row counts (s*s raw > 2^63); 19
             -- forces int128 while keeping 19+19 <= 38 legal
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(19,2)) AS s,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(19,4)) AS ss
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           CAST(s AS DOUBLE) AS sum_qty,
           CAST(ss AS DOUBLE) AS sumsq_qty,
           CAST(CAST((n * ss - s * s) / (n * (n - 1)) AS DECIMAL(18,6)) AS DOUBLE) AS var_qty,
           sqrt(CAST(CAST((n * ss - s * s) / (n * (n - 1)) AS DECIMAL(18,6)) AS DOUBLE)) AS std_qty
         FROM a ORDER BY l_returnflag""",
    "q_agg_histogram" ->
      """SELECT event_type, CAST(floor(value / 10) AS BIGINT) AS bucket,
           COUNT(*) AS n
         FROM events GROUP BY event_type, floor(value / 10)
         ORDER BY event_type, bucket""",
    "q_agg_mode" ->
      """WITH c AS (
           SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
           FROM orders GROUP BY o_orderstatus, o_orderpriority),
         r AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
             ORDER BY cnt DESC, o_orderpriority ASC) AS rn
           FROM c)
         SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
         FROM r WHERE rn = 1 ORDER BY o_orderstatus""",
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_price,
           CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE) AS avg_disc
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_multi_distinct" ->
      """SELECT event_type,
           COUNT(DISTINCT user_id) AS du,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS dk,
           COUNT(*) FILTER (WHERE value > 100) AS n_big,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50)
                AS DECIMAL(18,2)) AS DOUBLE) AS sum_bigk
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_rollup" ->
      """SELECT n_regionkey, n_nationkey, COUNT(*) AS n
         FROM nation GROUP BY ROLLUP (n_regionkey, n_nationkey)
         ORDER BY n_regionkey ASC NULLS FIRST, n_nationkey ASC NULLS FIRST""",
    "q_agg_cube" ->
      """SELECT event_type, parity, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
         FROM (SELECT event_type, user_id % 2 AS parity, value FROM events)
         GROUP BY CUBE (event_type, parity)
         ORDER BY event_type ASC NULLS FIRST, parity ASC NULLS FIRST""",
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g1,
           CAST(GROUPING(l_linestatus) AS INT) AS g2,
           COUNT(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_corr_spearman" ->
      """WITH b AS (
           SELECT l_returnflag,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
           FROM lineitem),
         r AS (
           SELECT l_returnflag,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY x)
               + COUNT(*) OVER (PARTITION BY l_returnflag, x) - 1 AS ra,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY y)
               + COUNT(*) OVER (PARTITION BY l_returnflag, y) - 1 AS rb
           FROM b),
         m AS (
           SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(ra AS HUGEINT)) AS sa,
             SUM(CAST(rb AS HUGEINT)) AS sb,
             SUM(CAST(ra AS HUGEINT) * ra) AS saa,
             SUM(CAST(rb AS HUGEINT) * rb) AS sbb,
             SUM(CAST(ra AS HUGEINT) * rb) AS sab
           FROM r GROUP BY l_returnflag)
         SELECT l_returnflag, n,
           CAST(CAST(n AS HUGEINT) * sab - sa * sb AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * saa - sa * sa AS DOUBLE)
                  * CAST(CAST(n AS HUGEINT) * sbb - sb * sb AS DOUBLE))
             AS spearman
         FROM m ORDER BY l_returnflag""",
    "q_agg_corr" ->
      """WITH m AS (
           SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sx,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS sxx,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS sxy
           FROM lineitem GROUP BY l_returnflag),
         w AS (
           SELECT l_returnflag, n,
             CAST(n AS DECIMAL(18,0)) AS nd,
             CAST(sx AS DECIMAL(19,2)) AS sxw,
             CAST(sy AS DECIMAL(19,2)) AS syw,
             CAST(sxx AS DECIMAL(19,4)) AS sxxw,
             CAST(syy AS DECIMAL(19,4)) AS syyw,
             CAST(sxy AS DECIMAL(19,4)) AS sxyw
           FROM m)
         SELECT l_returnflag, n,
           CAST(CAST((nd * sxyw - sxw * syw) / (n * (n - 1))
             AS DECIMAL(18,6)) AS DOUBLE) AS covar_qty_disc,
           CAST(nd * sxyw - sxw * syw AS DOUBLE)
             / sqrt(CAST(nd * sxxw - sxw * sxw AS DOUBLE)
                    * CAST(nd * syyw - syw * syw AS DOUBLE)) AS corr_qty_disc
         FROM w ORDER BY l_returnflag""",
    "q_pivot_multi" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cells = types.map { t =>
        s"""CAST(COUNT(*) FILTER (WHERE event_type = '$t') AS BIGINT)
              AS "${t}_n",
            CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
              FILTER (WHERE event_type = '$t') AS DECIMAL(18,2))
              AS DOUBLE) AS "${t}_sum""""
      }.mkString(",\n            ")
      s"""SELECT CAST(hour(ts) AS INT) AS hr,
            $cells
          FROM events GROUP BY hour(ts) ORDER BY hr"""
    },
    "q_pivot" ->
      """SELECT CAST(hour(ts) AS INT) AS hr,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER w AS rn
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q_window_running" ->
      """SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DECIMAL(18,2)) AS DOUBLE) AS running
         FROM events ORDER BY event_id""",
    "q_window_moving" ->
      """SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
                / COUNT(*) OVER w AS DECIMAL(18,6)) AS DOUBLE) AS mavg
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         ORDER BY event_id""",
    "q_window_range_frame" ->
      """SELECT event_id, user_id,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS DECIMAL(18,2)) AS DOUBLE) AS hour_sum
         FROM events ORDER BY event_id""",
    "q_window_lag" ->
      """SELECT event_id, user_id, value,
           LAG(value, 1) OVER w AS prev_value,
           value - LAG(value, 1) OVER w AS delta,
           LEAD(event_type, 1) OVER w AS next_type
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY event_id""",
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM
         (SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
          FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_nth" ->
      """SELECT user_id, first_type, last_type, second_type FROM
         (SELECT user_id,
            ROW_NUMBER() OVER w AS rn,
            FIRST_VALUE(event_type) OVER wf AS first_type,
            LAST_VALUE(event_type) OVER wf AS last_type,
            NTH_VALUE(event_type, 2) OVER wf AS second_type
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                 wf AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND UNBOUNDED FOLLOWING))
         WHERE rn = 1 ORDER BY user_id""",
    "q_agg_bitmap_distinct" ->
      """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events GROUP BY event_type ORDER BY event_type""")
}
