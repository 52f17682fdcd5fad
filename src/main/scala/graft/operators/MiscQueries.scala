package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Additional relational surface: unpivot/melt, outer generators,
  * arg-min/max, array algebra, by-name unions, percentiles. */
object MiscQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Wide→long unpivot (melt) of three measure columns. */
  val qUnpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        "metric", "val")

  /** explode_outer: rows with empty token filters survive with NULL —
    * the outer-generator surface. */
  val qExplodeOuter: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode_outer(filter(split(lower(col("text")), " "),
          t => t.like("s%"))).as("stok"))

  /** max_by / min_by with a provably-unique ordering key (custkey). */
  val qMinmaxBy: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(max_by(col("c_name"), col("c_custkey")).as("name_of_max_key"),
        min_by(col("c_name"), col("c_custkey")).as("name_of_min_key"),
        count(lit(1)).as("n"))

  /** Array algebra over token arrays: sort, distinct, slice, contains,
    * flatten. Distinct is sorted before output — element order of
    * array_distinct/list_distinct is not contract in either engine. */
  val qArrayOps: Q = (s, d) => {
    val toks = split(lower(col("text")), " ")
    Tables.documents(s, d)
      .select(col("doc_id"),
        // array columns are joined to strings: the driver's comparator
        // sorts rows via pandas, and ndarray cells are unhashable there
        array_join(array_sort(array_distinct(toks)), " ").as("vocab"),
        array_join(slice(array_sort(toks), 2, 3), " ").as("sl"),
        array_contains(toks, "the").as("has_the"),
        size(flatten(array(toks, toks))).as("n_flat"))
  }

  /** unionByName with allowMissingColumns: schema union, NULL fill —
    * DuckDB's UNION ALL BY NAME. */
  val qUnionByname: Q = (s, d) => {
    val a = Tables.orders(s, d)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"))
    val b = Tables.customer(s, d)
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    a.unionByName(b, allowMissingColumns = true)
  }

  /** Exact interpolated median per group (both engines sort exactly and
    * interpolate linearly over the same integer values). */
  val qPercentile: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(percentile(col("user_id"), lit(0.5)).as("median_user"),
        count(lit(1)).as("n"))

  /** ntile / percent_rank / cume_dist over a unique in-partition order —
    * all three are exact integer-ratio computations (one IEEE division),
    * deterministic cross-engine. */
  val qWindowNtile: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
  }

  /** Null-safe equality (`<=>` ↔ IS NOT DISTINCT FROM) joining on a
    * derived nullable key: NULL keys match each other. */
  val qNullsafeEq: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "P", col("o_orderpriority")).as("pk"))
    val priorities = Tables.orders(s, d)
      .select(when(col("o_orderstatus") === "P", col("o_orderpriority")).as("pk"))
      .distinct()
      .withColumn("tag", coalesce(col("pk"), lit("none")))
    o.join(priorities, o("pk") <=> priorities("pk"))
      .select(col("o_orderkey"), col("tag"))
  }

  /** WITH clause referenced twice — CTE reuse surface. */
  val qCteReuse: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("cte_orders")
    s.sql("""
      WITH big AS (
        SELECT o_custkey, o_totalprice FROM cte_orders
        WHERE o_totalprice > 300000)
      SELECT a.o_custkey,
        COUNT(*) AS n_pairs,
        CAST(CAST(SUM(CAST(a.o_totalprice + b.o_totalprice AS DECIMAL(18,2)))
             AS DECIMAL(18,2)) AS DOUBLE) AS pair_sum
      FROM big a JOIN big b
        ON a.o_custkey = b.o_custkey AND a.o_totalprice < b.o_totalprice
      GROUP BY a.o_custkey
      ORDER BY a.o_custkey""")
  }

  /** Banded range join: |s_acctbal − c_acctbal| < 10 without a cartesian.
    * A pure non-equi join plans as BroadcastNestedLoopJoin — O(n·m) at any
    * scale. Binning both sides into width-10 bands and equi-joining each
    * left band to its 3 adjacent right bands turns it into a hash join
    * with a residual filter: O(matches), the standard interval-join
    * rewrite. Results are identical to the naive form (the oracle IS the
    * naive form). */
  val qJoinBand: Q = (s, d) => {
    val width = 10.0
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_acctbal"),
        floor(col("s_acctbal") / width).as("band"))
      .withColumn("probe", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("band", col("band") + col("probe"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        floor(col("c_acctbal") / width).as("band"))
    sup.join(cust, Seq("band"))
      .filter(abs(col("s_acctbal") - col("c_acctbal")) < width)
      .select(col("s_suppkey"), col("c_custkey"), col("s_acctbal"),
        col("c_acctbal"))
  }

  /** Correlated scalar subquery — Catalyst decorrelates it into an
    * aggregate + left outer join (no per-row re-execution; verify with
    * explain that the plan is a join, which is why this scales). */
  val qScalarSubquery: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("ssq_customer")
    Tables.orders(s, d).createOrReplaceTempView("ssq_orders")
    s.sql("""
      SELECT c_custkey,
        (SELECT COUNT(*) FROM ssq_orders o
         WHERE o.o_custkey = c.c_custkey) AS n_orders,
        (SELECT MAX(o_totalprice) FROM ssq_orders o
         WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM ssq_customer c
      ORDER BY c_custkey""")
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — per-nation
    * top-2 customers by balance. Catalyst decorrelates the limit into a
    * rank-over-window on the inner side (no per-outer-row re-execution;
    * the plan is one customer-side window + a keyed join with the tiny
    * nation dim), which is why a lateral top-k scales: cost is one pass
    * over the big side regardless of outer cardinality. Ties break on
    * c_custkey, the inner table's key. */
  val qJoinLateral: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("lat_nation")
    Tables.customer(s, d).createOrReplaceTempView("lat_customer")
    s.sql(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM lat_nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM lat_customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t""".stripMargin)
  }

  /** IN (subquery) predicate — planned as a left-semi join like EXISTS,
    * but a distinct SQL surface (null semantics differ). */
  val qInSubquery: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("insq_orders")
    Tables.customer(s, d).createOrReplaceTempView("insq_customer")
    s.sql("""
      SELECT o_orderkey, o_custkey FROM insq_orders
      WHERE o_custkey IN (SELECT c_custkey FROM insq_customer
                          WHERE c_mktsegment = 'MACHINERY')
        AND o_totalprice > 350000
      ORDER BY o_orderkey""")
  }

  /** Boolean aggregate family: conditional counting and universal /
    * existential quantifiers per group — all map-side combinable (a
    * count partial and two boolean folds), one exchange. */
  val qAggBoolean: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count_if(col("value") > 100).as("n_big"),
        bool_and(col("value") >= 0).as("all_nonneg"),
        bool_or(col("value") > 190).as("any_huge"),
        count(lit(1)).as("n"))

  /** Pattern-predicate family as projected flags: LIKE, case-insensitive
    * ILIKE, regex RLIKE, and an escaped literal `%` — all codegen'd
    * map-side string predicates (a LIKE with a literal prefix is also
    * what parquet scans can push as a startsWith filter). */
  val qFilterLike: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_name").like("%green%").as("has_green"),
        col("p_name").ilike("%STEEL%").as("has_steel_ci"),
        col("p_type").rlike("^[A-Z]+ ").as("type_word_prefix"),
        col("p_brand").startsWith("Brand#1").as("brand1x"))

  /** ANSI-safe try_ arithmetic: NULL instead of error/poison on bad
    * denominators and out-of-bounds access — the contract that lets a
    * 100 TB batch survive dirty rows without try/catch UDFs. */
  val qTryArith: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        expr("try_divide(event_id, user_id % 7)").as("td"),
        expr("try_element_at(split(props, ':'), 9)").as("oob"))

  /** Bitwise function family over integer keys. */
  val qBitwise: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        (col("event_id").bitwiseAND(255L)).as("b_and"),
        (col("event_id").bitwiseOR(4096L)).as("b_or"),
        (col("event_id").bitwiseXOR(col("user_id"))).as("b_xor"),
        expr("shiftleft(event_id % 16, 2)").as("b_shl"),
        expr("shiftright(event_id, 3)").as("b_shr"),
        expr("bit_count(event_id)").as("b_cnt"))

  /** Conditional scalar functions: nullif / ifnull / greatest / least. */
  val qConditional: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        expr("ifnull(nullif(o_orderstatus, 'O'), 'open')").as("status_tag"),
        greatest(col("o_totalprice"), lit(250000.0)).as("floor250k"),
        least(col("o_totalprice"), lit(250000.0)).as("cap250k"))

  /** Ordered string aggregation (LISTAGG/string_agg): names per region,
    * sorted inside the group so the concatenation is deterministic
    * regardless of partitioning. Bounded-group contract: collect_list
    * materializes the group in memory — correct for dimension-sized
    * groups; unbounded groups belong in explode-side processing, not
    * string aggregation. */
  val qAggString: Q = (s, d) =>
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("names"),
        count(lit(1)).as("n"))

  /** Share-of-total per group: the corpus-level total is ONE driver-side
    * scalar (the mix_upsample/tfidf-N ingest-artifact precedent — a 1-row
    * frame joined in would plan a nested-loop), so the share is a single
    * map-side IEEE division after the group count. Never a
    * partition-less window (`sum().over()` with no partition moves every
    * row to one task). */
  val qShareOfTotal: Q = (s, d) => {
    val counts = Tables.events(s, d)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val total = Artifacts.scalar(s"eventsN:$d")(Tables.events(s, d).count())
    counts
      .select(col("event_type"), col("n"),
        (col("n").cast("double") / lit(total.toDouble)).as("share"))
  }

  /** Group-median imputation (data repair): a deterministic 1-in-7
    * "sensor dropout" nulls the value; each null refills with its event
    * type's EXACT doubled-scale median of the surviving cents (the
    * [[Outliers]] med2 device — an integer-valued double both engines
    * interpolate identically). Output stays on the doubled-cent integer
    * scale so nothing is ever a float. The 5-row median table
    * broadcasts back; one corpus scan each side of it. */
  val qImputeMedian: Q = (s, d) => {
    val cents = (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
      * lit(100)).cast("long")
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        when(pmod(col("event_id"), lit(7L)) === 0L, lit(null))
          .otherwise(cents).as("nn"))
    val med = ev.filter(col("nn").isNotNull)
      .groupBy(col("event_type"))
      .agg((percentile(col("nn"), lit(0.5)) * 2).as("med2"))
    ev.join(broadcast(med), "event_type")
      .select(col("event_id"), col("event_type"),
        coalesce(col("nn") * 2, col("med2").cast("long")).as("value2c"),
        col("nn").isNull.as("was_imputed"))
  }

  // ---- registry ---------------------------------------------------------

  /** Data-profiling audit: one pass over a table producing row count,
    * per-column null counts, exact distinct cardinalities, and value
    * ranges — the pre-training sanity report every ingest runs before a
    * table joins the corpus.
    *
    * Scale shape: multiple exact DISTINCT aggregates in one statement plan
    * through Spark's `Expand` (one row per distinct-column group) — a
    * constant small multiplier on the scan, partial-aggregated map-side,
    * never N separate scans of the 100 TB table. Sketches
    * (`q_agg_approx_distinct`) are the cheaper alternative when exactness
    * isn't required. */
  val qProfileTable: Q = (s, d) =>
    graft.Tables(s, d, "orders").agg(
      count(lit(1)).as("n_rows"),
      count(col("o_custkey")).as("nn_custkey"),
      countDistinct(col("o_custkey")).as("nd_custkey"),
      countDistinct(col("o_orderstatus")).as("nd_status"),
      countDistinct(col("o_orderpriority")).as("nd_priority"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"))

  /** Declarative data-quality constraint report (the Deequ-style ingest
    * gate): one row per constraint with its violation count and verdict —
    * primary-key uniqueness, referential integrity into the customer
    * dimension, NOT NULL, value range, and categorical domain. A batch
    * joins the corpus only when every row reads `passed`.
    *
    * Scale shape: the row-local constraints share ONE aggregation pass
    * over the fact scan (conditional counts + the pk distinct); the FK
    * check is a broadcast anti-join count against the dimension. Nothing
    * scans the 100 TB side twice for N constraints. */
  val qQualityConstraints: Q = (s, d) => {
    val orders = graft.Tables(s, d, "orders")
    val rowLocal = orders.agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dup"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_cust"),
      sum(when(col("o_totalprice") <= 0.0 ||
        col("o_totalprice") > 1000000.0, 1L).otherwise(0L)).as("bad_price"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
        .otherwise(0L)).as("bad_status"))
    // NULL keys are the not_null constraint's finding, not an FK orphan —
    // filtered on BOTH engines (a left_anti keeps null keys while SQL
    // NOT IN drops them, so leaving nulls in would diverge cross-engine)
    // customer scales with SF — no forced broadcast of the FK dimension;
    // the anti-join is keyed, AQE broadcasts it while it fits
    val fkViolations = orders.filter(col("o_custkey").isNotNull)
      .join(
        graft.Tables(s, d, "customer")
          .select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("fk_orphans"))
    val cs = rowLocal.select(explode(array(
      struct(lit("pk_unique_orderkey").as("constraint"),
        col("pk_dup").as("violations")),
      struct(lit("not_null_custkey").as("constraint"),
        col("null_cust").as("violations")),
      struct(lit("price_in_range").as("constraint"),
        col("bad_price").as("violations")),
      struct(lit("status_in_domain").as("constraint"),
        col("bad_status").as("violations")))).as("c"))
      .select(col("c.constraint"), col("c.violations"))
      .unionByName(fkViolations.select(
        lit("fk_custkey_in_customer").as("constraint"),
        col("fk_orphans").as("violations")))
    cs.select(col("constraint"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Snapshot-to-snapshot distribution drift — the mix-shift audit run
    * when a corpus is re-crawled: per-(lang, source) document counts of
    * two snapshots (here even vs odd doc_ids) with each cell's integer
    * per-mille share of its snapshot and the absolute share shift,
    * flagged when it exceeds 2%. All-integer (cross-multiplied `div`,
    * no floats), so the full report is oracle-checked; the PSI variant
    * with its ln() term lives in the test suite, same float policy as
    * tf-idf/BM25.
    *
    * Scale shape: ONE scan and one map-side-combinable aggregation —
    * both snapshots' counts are conditional sums in the same groupBy,
    * so there is no self-join of the corpus. The share window runs
    * over the already-aggregated |lang × source| frame (~dozens of
    * rows), the q_vocab_topk precedent for a single-partition window
    * on a reduced frame. */
  val qDriftSnapshot: Q = (s, d) =>
    graft.Tables(s, d, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("pm_a", expr("n_a * 1000 div sum(n_a) over ()"))
      .withColumn("pm_b", expr("n_b * 1000 div sum(n_b) over ()"))
      .withColumn("delta_pm", abs(col("pm_a") - col("pm_b")))
      .withColumn("drifted", col("delta_pm") >= 20)

  /** Cross-engine ingest manifest: row count + order-independent bit_xor
    * content digest over a canonical row serialization (length-prefixed
    * string-cast columns joined by `|`, NULL → `n` — a prefix code,
    * injective for any cell content — → sha-256 → 60-bit prefix —
    * XOR folding is commutative, so any partitioning or row order gives
    * the same value, and the whole check is ONE map-side-combinable
    * pass). Declared so the oracle gate proves the digest is
    * engine-independent: a landing written by Spark can be verified by
    * DuckDB or any other stack computing the same canonical form.
    * [[graft.pipeline.Manifest]] is the operational wrapper. */
  val qIngestManifest: Q = (s, d) => {
    val docs = graft.Tables(s, d, "documents")
    docs.select(graft.pipeline.Manifest.rowDigest(docs).as("p"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(p)").as("xor_digest"),
        sum(expr("shiftright(p, 30)")).as("sum_hi"),
        sum(expr("p & 1073741823")).as("sum_lo"))
  }

  /** Year-over-year growth: yearly decimal revenue with the exact
    * percentage delta vs the prior year (lag over the |years|-row
    * rollup; one decimal division at the output boundary; first year
    * reads NULL). */
  val qYoyGrowth: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.orderBy("yr")
    val dec2 = "decimal(18,2)"
    graft.Tables(s, d, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(sum(col("o_totalprice").cast(dec2)).cast(dec2).as("rev_dec"))
      .withColumn("prev", lag(col("rev_dec"), 1).over(w))
      .select(col("yr"), col("rev_dec").cast("double").as("revenue"),
        (lit(100).cast(dec2) * (col("rev_dec") - col("prev")) / col("prev"))
          .cast("decimal(18,6)").cast("double").as("yoy_pct"))
  }

  /** Percent-of-parent hierarchy: each nation's exact decimal revenue
    * share within its region, and each region's within the total — the
    * drill-down ratio block of every BI rollup. Shares divide once at
    * DECIMAL(18,6) over full-frame window sums on the |nations|-row
    * rollup (the fact table is scanned once; everything after the first
    * aggregate is dimension-sized). */
  val qShareHierarchy: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    val dec2 = "decimal(18,2)"
    val byNation = graft.Tables(s, d, "orders")
      .join(graft.Tables(s, d, "customer")
        .select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(graft.Tables(s, d, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.Tables(s, d, "region")
        .select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice").cast(dec2)).cast(dec2).as("rev_dec"))
    val regionW = w.partitionBy("r_name")
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    val allW = w.partitionBy()
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    byNation
      .withColumn("region_rev", sum(col("rev_dec")).over(regionW))
      .withColumn("total_rev", sum(col("rev_dec")).over(allW))
      .select(col("r_name"), col("n_name"),
        col("rev_dec").cast("double").as("revenue"),
        (col("rev_dec") / col("region_rev"))
          .cast("decimal(18,6)").cast("double").as("share_of_region"),
        (col("region_rev") / col("total_rev"))
          .cast("decimal(18,6)").cast("double").as("region_share_of_total"))
  }

  /** Day-of-week activity profile: event count and exact ppm share per
    * weekday — the seasonality fingerprint behind anomaly baselines and
    * capacity planning. Engine note pinned by the oracle: Spark
    * `dayofweek` is 1=Sunday..7, DuckDB's is 0=Sunday..6 — normalized
    * to ISO (1=Monday..7) in BOTH via explicit arithmetic, never the
    * raw builtin. */
  val qDowProfile: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
    val all = w.partitionBy()
      .rowsBetween(w.unboundedPreceding, w.unboundedFollowing)
    graft.Tables(s, d, "events")
      // Spark: dayofweek 1=Sun..7=Sat → ISO: ((x + 5) % 7) + 1
      .select((pmod(dayofweek(col("ts")) + 5, lit(7)) + 1).as("iso_dow"))
      .groupBy(col("iso_dow"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(all))
      .select(col("iso_dow").cast("int").as("iso_dow"), col("n"),
        expr("n * 1000000 div total").as("share_ppm"))
  }

  /** Benford first-digit conformance of order totals — the data-quality
    * forensic for detecting fabricated or truncated numeric columns:
    * observed first-significant-digit shares vs the Benford expectation
    * log10(1+1/d), both in ppm. The expected shares are pinned integer
    * constants (identical literals in the oracle), the first digit
    * comes from the cents INTEGER's decimal string — no float log or
    * division anywhere; delta_ppm > ~15000 on a digit is the classic
    * red flag. One map-side digit projection + a 9-row rollup. */
  val qQualityBenford: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val benford = map(
      (1 to 9).flatMap(dd => Seq(lit(dd), lit(dd match {
        case 1 => 301030L; case 2 => 176091L; case 3 => 124939L
        case 4 => 96910L; case 5 => 79181L; case 6 => 66947L
        case 7 => 57992L; case 8 => 51153L; case 9 => 45757L
      }))): _*)
    Tables.orders(s, d)
      .select(substring(((col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long")).cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share_ppm",
        // decimal(19,0) product to match the oracle's HUGEINT ride
        // (MiscQueries oracle casts g.n to HUGEINT); plain Long would
        // throw under ANSI at ~9.2e12 rows per digit where DuckDB stays
        // exact
        expr("CAST(n AS DECIMAL(19,0)) * 1000000 div sum(n) over ()"))
      .withColumn("benford_ppm", element_at(benford, col("digit")))
      .select(col("digit"), col("n"), col("share_ppm"), col("benford_ppm"),
        abs(col("share_ppm") - col("benford_ppm")).as("delta_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_impute_median" -> qImputeMedian,
    "q_quality_benford" -> qQualityBenford,
    "q_dow_profile" -> qDowProfile,
    "q_share_hierarchy" -> qShareHierarchy,
    "q_yoy_growth" -> qYoyGrowth,
    "q_ingest_manifest" -> qIngestManifest,
    "q_drift_snapshot" -> qDriftSnapshot,
    "q_quality_constraints" -> qQualityConstraints,
    "q_profile_table" -> qProfileTable,
    "q_agg_string" -> qAggString,
    "q_share_of_total" -> qShareOfTotal,
    "q_unpivot" -> qUnpivot,
    "q_explode_outer" -> qExplodeOuter,
    "q_minmax_by" -> qMinmaxBy,
    "q_array_ops" -> qArrayOps,
    "q_union_byname" -> qUnionByname,
    "q_percentile" -> qPercentile,
    "q_join_band" -> qJoinBand,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_window_ntile" -> qWindowNtile,
    "q_nullsafe_eq" -> qNullsafeEq,
    "q_cte_reuse" -> qCteReuse,
    "q_in_subquery" -> qInSubquery,
    "q_join_lateral" -> qJoinLateral,
    "q_agg_boolean" -> qAggBoolean,
    "q_filter_like" -> qFilterLike,
    "q_try_arith" -> qTryArith,
    "q_bitwise" -> qBitwise,
    "q_conditional" -> qConditional)

  val oracleSql: Map[String, String] = Map(
    "q_quality_benford" ->
      """WITH f AS (
           SELECT CAST(substring(CAST(CAST(CAST(o_totalprice
               AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
             AS INT) AS digit
           FROM orders),
         g AS (SELECT digit, COUNT(*) AS n FROM f GROUP BY digit),
         b(digit, benford_ppm) AS (VALUES
           (1, 301030), (2, 176091), (3, 124939), (4, 96910),
           (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757))
         SELECT g.digit, g.n,
           CAST(CAST(g.n AS HUGEINT) * 1000000 // SUM(g.n) OVER ()
             AS BIGINT) AS share_ppm,
           CAST(b.benford_ppm AS BIGINT) AS benford_ppm,
           CAST(abs(CAST(g.n AS HUGEINT) * 1000000 // SUM(g.n) OVER ()
             - b.benford_ppm) AS BIGINT) AS delta_ppm
         FROM g JOIN b USING (digit)""",
    "q_impute_median" ->
      """WITH f AS (
           SELECT event_id, event_type,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
             END AS nn
           FROM events),
         m AS (
           SELECT event_type, quantile_cont(nn, 0.5) * 2 AS med2
           FROM f WHERE nn IS NOT NULL GROUP BY 1)
         SELECT f.event_id, f.event_type,
           CAST(COALESCE(f.nn * 2, CAST(m.med2 AS BIGINT)) AS BIGINT)
             AS value2c,
           f.nn IS NULL AS was_imputed
         FROM f JOIN m USING (event_type)""",
    "q_dow_profile" ->
      """WITH d AS (
           SELECT ((dayofweek(ts) + 6) % 7) + 1 AS iso_dow
           FROM events),
         c AS (SELECT iso_dow, CAST(COUNT(*) AS BIGINT) AS n
               FROM d GROUP BY iso_dow),
         t AS (SELECT c.*, SUM(n) OVER () AS total FROM c)
         SELECT CAST(iso_dow AS INT) AS iso_dow, n,
           CAST(n * 1000000 // total AS BIGINT) AS share_ppm
         FROM t ORDER BY iso_dow""",
    "q_share_hierarchy" ->
      """WITH bn AS (
           SELECT r_name, n_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev_dec
           FROM orders
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY r_name, n_name),
         wsum AS (
           SELECT bn.*,
             SUM(rev_dec) OVER (PARTITION BY r_name) AS region_rev,
             SUM(rev_dec) OVER () AS total_rev
           FROM bn)
         SELECT r_name, n_name, CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(CAST(rev_dec / region_rev AS DECIMAL(18,6)) AS DOUBLE)
             AS share_of_region,
           CAST(CAST(region_rev / total_rev AS DECIMAL(18,6)) AS DOUBLE)
             AS region_share_of_total
         FROM wsum ORDER BY r_name, n_name""",
    "q_yoy_growth" ->
      """WITH y AS (
           SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               AS DECIMAL(18,2)) AS rev_dec
           FROM orders GROUP BY EXTRACT(YEAR FROM o_orderdate)),
         l AS (SELECT y.*, lag(rev_dec) OVER (ORDER BY yr) AS prev FROM y)
         SELECT yr, CAST(rev_dec AS DOUBLE) AS revenue,
           CAST(CAST(CAST(100 AS DECIMAL(18,2)) * (rev_dec - prev) / prev
             AS DECIMAL(18,6)) AS DOUBLE) AS yoy_pct
         FROM l ORDER BY yr""",
    "q_drift_snapshot" ->
      """WITH g AS (
           SELECT lang, source,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
           FROM documents GROUP BY lang, source),
         p AS (
           SELECT lang, source, n_a, n_b,
             CAST(n_a * 1000 // CAST(SUM(n_a) OVER () AS BIGINT) AS BIGINT) AS pm_a,
             CAST(n_b * 1000 // CAST(SUM(n_b) OVER () AS BIGINT) AS BIGINT) AS pm_b
           FROM g)
         SELECT lang, source, n_a, n_b, pm_a, pm_b,
           abs(pm_a - pm_b) AS delta_pm,
           abs(pm_a - pm_b) >= 20 AS drifted
         FROM p ORDER BY lang, source""",
    "q_ingest_manifest" ->
      """WITH p AS (
           SELECT CAST('0x' || substring(sha256(
             concat_ws('|',
               coalesce(len(CAST(doc_id AS VARCHAR)) || ':'
                 || CAST(doc_id AS VARCHAR), 'n'),
               coalesce(len(text) || ':' || text, 'n'),
               coalesce(len(lang) || ':' || lang, 'n'),
               coalesce(len(source) || ':' || source, 'n'),
               coalesce(len(CAST(n_chars AS VARCHAR)) || ':'
                 || CAST(n_chars AS VARCHAR), 'n'))), 1, 15)
             AS BIGINT) AS p
           FROM documents)
         SELECT COUNT(*) AS n_rows, bit_xor(p) AS xor_digest,
           CAST(SUM(p >> 30) AS BIGINT) AS sum_hi,
           CAST(SUM(p & 1073741823) AS BIGINT) AS sum_lo
         FROM p""",
    "q_quality_constraints" ->
      """WITH rl AS (
           SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS null_cust,
             CAST(SUM(CASE WHEN o_totalprice <= 0.0
               OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END)
               AS BIGINT) AS bad_price,
             CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
               THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
           FROM orders),
         fk AS (
           SELECT COUNT(*) AS fk_orphans FROM orders o
           WHERE o.o_custkey IS NOT NULL
             AND o.o_custkey NOT IN
               (SELECT c_custkey FROM customer)),
         c AS (
           SELECT 'pk_unique_orderkey' AS "constraint",
                  pk_dup AS violations
             FROM rl
           UNION ALL
           SELECT 'not_null_custkey', null_cust FROM rl
           UNION ALL
           SELECT 'price_in_range', bad_price FROM rl
           UNION ALL
           SELECT 'status_in_domain', bad_status FROM rl
           UNION ALL
           SELECT 'fk_custkey_in_customer', fk_orphans FROM fk)
         SELECT "constraint", violations, violations = 0 AS passed
         FROM c ORDER BY "constraint"""",
    "q_profile_table" ->
      """SELECT COUNT(*) AS n_rows,
           COUNT(o_custkey) AS nn_custkey,
           COUNT(DISTINCT o_custkey) AS nd_custkey,
           COUNT(DISTINCT o_orderstatus) AS nd_status,
           COUNT(DISTINCT o_orderpriority) AS nd_priority,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date
         FROM orders""",
    "q_agg_string" ->
      """SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS names,
           COUNT(*) AS n
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q_share_of_total" ->
      """SELECT event_type, COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE) /
             CAST((SELECT COUNT(*) FROM events) AS DOUBLE) AS share
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber,
           CAST(metric AS VARCHAR) AS metric, val FROM
         (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
          FROM lineitem)
         UNPIVOT (val FOR metric IN (l_quantity, l_discount, l_tax))
         -- metric is an ENUM in DuckDB (declaration order) - cast to
         -- VARCHAR so the sort matches Spark's string ordering
         ORDER BY l_orderkey, l_linenumber, CAST(metric AS VARCHAR), val""",
    "q_explode_outer" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x LIKE 's%') AS st
           FROM documents)
         SELECT doc_id, stok FROM (
           SELECT doc_id, unnest(st) AS stok FROM t WHERE len(st) > 0
           UNION ALL
           SELECT doc_id, NULL AS stok FROM t WHERE len(st) = 0)
         ORDER BY doc_id, stok NULLS FIRST""",
    "q_minmax_by" ->
      """SELECT c_nationkey,
           arg_max(c_name, c_custkey) AS name_of_max_key,
           arg_min(c_name, c_custkey) AS name_of_min_key,
           COUNT(*) AS n
         FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_array_ops" ->
      """SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS vocab,
           array_to_string(list_sort(string_split(lower(text), ' '))[2:4], ' ') AS sl,
           list_contains(string_split(lower(text), ' '), 'the') AS has_the,
           CAST(len(flatten([string_split(lower(text), ' '),
                             string_split(lower(text), ' ')])) AS INT) AS n_flat
         FROM documents ORDER BY doc_id""",
    "q_union_byname" ->
      """SELECT key, price, name FROM (
           SELECT o_orderkey AS key, o_totalprice AS price FROM orders
           UNION ALL BY NAME
           SELECT c_custkey AS key, c_name AS name FROM customer)
         ORDER BY key ASC, price ASC NULLS FIRST""",
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'MACHINERY')
           AND o_totalprice > 350000
         ORDER BY o_orderkey""",
    "q_join_lateral" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
         FROM nation n,
         LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
         ORDER BY n.n_name, t.c_custkey""",
    "q_agg_boolean" ->
      """SELECT event_type,
           CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_big,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 190) AS any_huge,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_filter_like" ->
      """SELECT p_partkey,
           p_name LIKE '%green%' AS has_green,
           p_name ILIKE '%STEEL%' AS has_steel_ci,
           regexp_matches(p_type, '^[A-Z]+ ') AS type_word_prefix,
           p_brand LIKE 'Brand#1%' AS brand1x
         FROM part ORDER BY p_partkey""",
    "q_try_arith" ->
      """SELECT event_id,
           CASE WHEN user_id % 7 = 0 THEN NULL
                ELSE CAST(event_id AS DOUBLE) / CAST(user_id % 7 AS DOUBLE)
           END AS td,
           string_split(props, ':')[9] AS oob
         FROM events ORDER BY event_id""",
    "q_bitwise" ->
      """SELECT event_id,
           event_id & 255 AS b_and,
           event_id | 4096 AS b_or,
           xor(event_id, user_id) AS b_xor,
           (event_id % 16) << 2 AS b_shl,
           event_id >> 3 AS b_shr,
           CAST(bit_count(event_id) AS INT) AS b_cnt
         FROM events ORDER BY event_id""",
    "q_conditional" ->
      """SELECT o_orderkey,
           nullif(o_orderstatus, 'O') AS status_or_null,
           ifnull(nullif(o_orderstatus, 'O'), 'open') AS status_tag,
           greatest(o_totalprice, 250000.0) AS floor250k,
           least(o_totalprice, 250000.0) AS cap250k
         FROM orders ORDER BY o_orderkey""",
    "q_window_ntile" ->
      """SELECT o_custkey, o_orderkey,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS prank,
           CUME_DIST() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC)
         ORDER BY o_custkey, o_orderkey""",
    "q_nullsafe_eq" ->
      """SELECT o.o_orderkey, p.tag FROM
         (SELECT o_orderkey,
            CASE WHEN o_orderstatus = 'P' THEN o_orderpriority END AS pk
          FROM orders) o
         JOIN
         (SELECT pk, COALESCE(pk, 'none') AS tag FROM
           (SELECT DISTINCT
              CASE WHEN o_orderstatus = 'P' THEN o_orderpriority END AS pk
            FROM orders)) p
         ON o.pk IS NOT DISTINCT FROM p.pk
         ORDER BY o.o_orderkey""",
    "q_cte_reuse" ->
      """WITH big AS (
           SELECT o_custkey, o_totalprice FROM orders
           WHERE o_totalprice > 300000)
         SELECT a.o_custkey,
           COUNT(*) AS n_pairs,
           CAST(CAST(SUM(CAST(a.o_totalprice + b.o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS pair_sum
         FROM big a JOIN big b
           ON a.o_custkey = b.o_custkey AND a.o_totalprice < b.o_totalprice
         GROUP BY a.o_custkey
         ORDER BY a.o_custkey""",
    "q_join_band" ->
      """SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
         FROM supplier JOIN customer
           ON abs(s_acctbal - c_acctbal) < 10
         ORDER BY s_suppkey, c_custkey""",
    "q_scalar_subquery" ->
      """SELECT c_custkey,
           (SELECT COUNT(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n_orders,
           (SELECT MAX(o_totalprice) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS max_price
         FROM customer c ORDER BY c_custkey""",
    "q_percentile" ->
      """SELECT event_type,
           quantile_cont(user_id, 0.5) AS median_user,
           COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""")
}
