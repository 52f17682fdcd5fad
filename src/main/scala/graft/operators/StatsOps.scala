package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.Tables

/** Resampling + distribution-shift statistics, exact-integer style: the
  * uncertainty/monitoring layer a training-data pipeline runs next to
  * its point estimates ([[Attribution.abtestTtest]] is the two-sample
  * sibling; [[graft.operators.MiscQueries]]'s drift_snapshot the
  * unscored census). Both operators follow the house rules: decisions
  * and readouts are exact integers (md5-derived randomness, cross-
  * multiplied rationals, div-quantized grains), so the DuckDB oracle
  * hash-matches bit-for-bit and reruns are partitioning-independent.
  */
object StatsOps {

  type Q = (SparkSession, String) => DataFrame

  /** Bootstrap replica count. 32 replicas put the 2nd-smallest/2nd-
    * largest replica means near the 5th/95th percentile of the
    * bootstrap distribution — a standard small-B percentile CI. */
  val Replicas = 32

  /** Cumulative Poisson(1) thresholds in the draw's NATIVE 2²⁴ grain:
    * P(X ≤ k) · 2²⁴ floored, k = 0..8. The 6-hex md5 window IS a
    * uniform draw on [0, 2²⁴) — comparing in that grain avoids the
    * `mod 10⁶` bias (16 777 216 is not a multiple of 10⁶; the first
    * 777 216 ppm values would land 17/16 as often, which skewed the
    * mean weight to ~0.970). w = #{k : h ≥ c_k} — the exact integer
    * inverse-CDF, identical literals in both engines. */
  val PoissonCum24: Seq[Long] =
    Seq(6171992L, 12343985L, 15429982L, 16458647L, 16715813L,
      16767247L, 16775819L, 16777044L, 16777197L)

  /** Deterministic Poisson(1) bootstrap weight for (row, replica) —
    * the single-expression REFERENCE form (the distribution spec
    * drives it directly; [[qBootstrapCi]] stages the same draw so the
    * 7 md5s evaluate once per row, see its shape note). One md5 yields
    * FIVE independent 6-hex draw windows (avalanche makes the windows
    * independent), so 32 replicas cost ⌈32/5⌉ = 7 hashes per row
    * instead of 32 — md5 is the whole cost of the replica fan-out at
    * scale (measured 5× at sf1). Window selection `r mod 5` over hash
    * input `r div 5` is mirrored verbatim in the oracle. */
  def poissonWeight(idCol: Column, replica: Column): Column = {
    val grp = floor(replica.cast("double") / 5.0).cast("int")
    val hash = md5(concat(idCol.cast(StringType), lit("#boot"),
      grp.cast(StringType)))
    val pos = lit(1) + lit(6) * pmod(replica, lit(5))
    val h = conv(substr(hash, pos, lit(6)), 16, 10).cast("long")
    PoissonCum24.map(c => when(h >= c, 1).otherwise(0))
      .reduce(_ + _)
  }

  /** Percentile-bootstrap CI for the per-type mean event value, fully
    * deterministic: every (row, replica) pair draws a Poisson(1) weight
    * from md5 (the multinomial bootstrap's large-n limit — the SAME
    * approximation Spark's own poisson `sample()` makes, but
    * rerun-stable and cross-engine exact), each replica's weighted mean
    * rides as the exact milli-grain integer (10³·Σw·c) div Σw, and the
    * CI is the 2nd-smallest/2nd-largest of the 32 replica means
    * (≈ p5/p95). Degenerate replicas (Σw = 0) are dropped by the
    * CASE-guarded division, exactly as in the oracle.
    *
    * 100 TB shape: the replica fan-out (×32) happens MAP-SIDE on the
    * stream and immediately contracts into the (type, replica)
    * sufficient-stats rollup — one map-side-combinable aggregate, never
    * a materialized 32× copy; the rank windows run over the 5×32-row
    * rollup. At any corpus size the shuffle carries ≤ |types|·32·2
    * longs. */
  val qBootstrapCi: Q = (s, d) => {
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    // Shape note: the 7 digest draw-tuples live in a Project BELOW the
    // Generate (attributes, evaluated once per INPUT row —
    // CollapseProject won't inline them into the generator because each
    // is referenced five times), and the 32 window picks ride the
    // generator input array, which GenerateExec evaluates once per
    // input row. The hash-after-explode shape (one digest per OUTPUT
    // row = 32/row) measured 4.2 s vs 2.8 s back in r11 and stays
    // rejected; the inverse-CDF compare (9 integer comparisons) stays
    // AFTER the fan-out where per-element work is cheap.
    val nHashes = (Replicas + 4) / 5
    // r17: the seven md5 draw tuples ride the codegen'd
    // [[graft.functions.Md5Draws24]] kernel — the five 6-hex windows of
    // one md5 are nibble-aligned at byte offsets 3k, so the kernel reads
    // each 24-bit window straight off the raw digest bytes with a
    // thread-local MessageDigest: no 32-char hex encode, no base-16
    // conv parse (the r17 interim form paid 19 conv(substr(...)) per
    // row; the r14 contract form, 32). Md5DrawsSpec pins the kernel
    // against the contract hex/conv form value-for-value; the DuckDB
    // oracle keeps the textual form, and the full-query draw stream was
    // verified identical (equal draw sums over all 3.2M (row, replica)
    // pairs). Measured 3.3 → 2.45 s (chunked-conv interim) → 1.6 s
    // with this kernel + the long-multiply agg below (local[32]/sf0.1,
    // median-of-8). The rejected variants stand: md5s inlined in the
    // generator (10.5 s, r11), all-32-window staging (4.5–5.9 s, r14),
    // wide 64-accumulator agg (7.0 s, codegen field limit, r17),
    // struct-of-(w,wc) generate (49 s, post-generate hazard, r17).
    val drawCols = (0 until nHashes).map { g =>
      graft.functions.Md5Draws24.md5Draws(
        concat(col("event_id").cast(StringType), lit("#boot"),
          lit(g).cast(StringType))).as(s"dr$g")
    }
    val draws = array((0 until Replicas).map { r =>
      element_at(col(s"dr${r / 5}"), r % 5 + 1)
    }: _*)
    val reps = Tables.events(s, d)
      .select(Seq(col("event_type"), cents.as("cents")) ++ drawCols: _*)
      .select(col("event_type"), col("cents"),
        posexplode(draws).as(Seq("r", "h")))
      .withColumn("w",
        PoissonCum24.map(c => when(col("h") >= c, 1).otherwise(0))
          .reduce(_ + _))
      .groupBy(col("event_type"), col("r"))
      // w·cents multiplies in LONG (w ≤ 9, |cents| ≤ 10¹⁸ by the
      // DECIMAL(18,2) input cast, so |w·cents| ≤ 9·10¹⁸ < 2⁶³−1) and
      // casts ONCE to DECIMAL(28,0); the SUM keeps the same
      // DECIMAL(38,0) headroom as the old decimal×decimal form but
      // drops a per-exploded-row BigDecimal multiply (~5% alone; the
      // full-query numbers ride the kernel note above).
      .agg(sum(col("w").cast("long")).as("sw"),
        sum((col("w").cast("long") * col("cents"))
          .cast(DecimalType(28, 0))).as("swc"))
      .withColumn("mean_milli",
        expr("CASE WHEN sw > 0 THEN CAST((swc * 1000) div sw AS LONG) END"))
      .filter(col("mean_milli").isNotNull)
    val wAsc = Window.partitionBy("event_type")
      .orderBy(col("mean_milli").asc, col("r").asc)
    val wDesc = Window.partitionBy("event_type")
      .orderBy(col("mean_milli").desc, col("r").desc)
    reps
      .withColumn("rk_lo", row_number().over(wAsc))
      .withColumn("rk_hi", row_number().over(wDesc))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_replicas"),
        max(when(col("rk_lo") === 2, col("mean_milli"))).as("lo_milli"),
        max(when(col("rk_hi") === 2, col("mean_milli"))).as("hi_milli"))
  }

  /** Two-window categorical drift, exact: event-type mix in the first
    * half of the month (day ≤ 15) vs the second, scored with the 2×k
    * chi-square identity — per-type contribution
    * (o1·N2 − o2·N1)² / ((o1+o2)·N1·N2), an exact rational quantized
    * at micro grain with the GRAIN FOLDED INTO THE DENOMINATOR
    * (`dd² div (den div 10⁶)`) — both engines compute the identical
    * integer, and dd² alone must fit decimal(38): |dd| ≤ c·max(N1,N2)
    * ≤ 10¹⁹ holds through ~10⁹–10¹⁰ rows per window; past that,
    * pre-aggregate to coarser cells first (the qAggSkew envelope
    * discipline). The numerator-side ·10⁶ variant would cap the same
    * envelope 1000× lower — and a fixture too small for the folded
    * denominator (c·N1·N2 < 10⁶) yields NULL via the shared CASE
    * guard rather than an engine-dependent /0. `drifted` flags a type
    * whose contribution clears the df=1 critical value 3.841 (the
    * per-cell screen; sum contrib_micro for the family-wide df=k−1
    * test).
    *
    * 100 TB shape: ONE map-side-combinable rollup of the stream into
    * |types| rows of (o1, o2); the window totals ride global windows
    * over that contracted rollup. */
  val qDriftChisq: Q = (s, d) => {
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val wAll = Window.partitionBy()
    Tables.events(s, d)
      .select(col("event_type"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L).as("early"))
      .groupBy(col("event_type"))
      .agg(sum(col("early")).as("o1"),
        sum(lit(1L) - col("early")).as("o2"))
      .withColumn("n1", sum(col("o1")).over(wAll))
      .withColumn("n2", sum(col("o2")).over(wAll))
      .withColumn("dd",
        dec(col("o1")) * dec(col("n2")) - dec(col("o2")) * dec(col("n1")))
      .withColumn("den_micro",
        expr("((o1 + o2) * CAST(n1 AS DECIMAL(38,0)) * n2) div 1000000"))
      .select(col("event_type"), col("o1"), col("o2"),
        expr("""CASE WHEN den_micro > 0
                THEN CAST((dd * dd) div den_micro AS LONG) END""")
          .as("contrib_micro"))
      .withColumn("drifted", col("contrib_micro") > 3841000L)
  }

  /** One-way ANOVA F across FIVE md5 experiment arms, per event type —
    * the k-group extension of [[Attribution.abtestTtest]] (same
    * deterministic md5 arm assignment, `% 5` instead of `% 2`). The
    * between/within sums of squares ride a DECLARED cents² integer
    * grain: every per-arm term (S_j² div n_j, (n_j·Q_j − S_j²) div n_j)
    * is an exact integer floor identical in both engines, every div
    * operand is non-negative (n_j·Q_j ≥ S_j² by Cauchy–Schwarz, so
    * trunc-vs-floor division semantics never diverge cross-engine),
    * and the α = 0.05 decision is the cross-multiplied inequality
    * ssb·(N−k)·10⁴ > F_crit(k−1, ∞)·10⁴ · ssw·(k−1) with the
    * asymptotic (df₂ → ∞) critical values pinned as identical CASE
    * literals — the large-N screen a corpus-scale experiment readout
    * wants (exact F_crit at small N is smaller-df₂-larger, so this
    * under-rejects slightly on tiny fixtures; declared).
    *
    * Headroom: with cents ≤ 10⁵, S_j² div n_j ≤ 10¹⁰·n_j — the LONG
    * div result is safe to n_j ≈ 10⁸ rows per arm; the decision
    * products ride decimal(38) to N ≈ 10⁹. Past that, pre-aggregate
    * values to a coarser grain first (the [[AggQueries]] qAggSkew
    * discipline).
    *
    * 100 TB shape: ONE map-side-combinable rollup of the stream into
    * 5 types × 5 arms of three sufficient statistics; everything after
    * is 25-row arithmetic. */
  val qAbtestAnova: Q = (s, d) => {
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val arms = Tables.events(s, d)
      .select(col("event_type"),
        Hashing.md5Bucket(col("user_id"), "", 5L).as("arm"),
        cents.as("cents"))
      .groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("nj"),
        sum(col("cents")).as("sj"),
        sum(col("cents").cast("decimal(19,0)") * col("cents")).as("qj"))
    arms.groupBy(col("event_type"))
      .agg(sum(col("nj")).as("n"),
        count(lit(1)).as("k"),
        sum(col("sj")).as("stot"),
        sum(expr("CAST((CAST(sj AS DECIMAL(38,0)) * sj) div nj" +
          " AS DECIMAL(38,0))")).as("sb_part"),
        sum(expr("CAST((CAST(nj AS DECIMAL(38,0)) * qj" +
          " - CAST(sj AS DECIMAL(38,0)) * sj) div nj" +
          " AS DECIMAL(38,0))")).as("sswd"))
      .withColumn("ssbd", col("sb_part") -
        expr("(CAST(stot AS DECIMAL(38,0)) * stot) div n"))
      .withColumn("crit4",
        expr("""CASE k WHEN 2 THEN 38415 WHEN 3 THEN 29957
                       WHEN 4 THEN 26049 ELSE 23719 END"""))
      .select(col("event_type"), col("n"), col("k").as("k_arms"),
        col("ssbd").cast("long").as("ssb_q"),
        col("sswd").cast("long").as("ssw_q"),
        when(col("sswd") > 0 && col("k") > 1,
          expr("CAST((CAST(ssbd AS DECIMAL(38,0)) * (n - k) * 1000)" +
            " div (CAST(sswd AS DECIMAL(38,0)) * (k - 1)) AS LONG)"))
          .as("f_milli"),
        when(col("sswd") > 0 && col("k") > 1,
          dec(col("ssbd")) * (col("n") - col("k")) * lit(10000) >
            dec(col("crit4")) * col("sswd") * (col("k") - 1))
          .as("rejected"))
  }

  /** McNemar's paired test across two CURATION FILTERS on the same
    * corpus, per language — "do the word-count rule and the stopword
    * rule keep documents at the same rate?" The filters are two real
    * rules of [[TextQueries]]'s gopher gate (r_wordcount: 50 ≤ n_words
    * ≤ 10⁵; r_stopwords: ≥ 2 function words), evaluated on the SAME
    * documents, so marginal homogeneity is exactly McNemar's b/c
    * discordant-pair statistic: χ² = (b−c)²/(b+c), α = 0.05 rejected
    * iff (b−c)²·10⁴ > 38415·(b+c) — cross-multiplied, exact, NULL
    * (not an ANSI error) when the filters never disagree (b+c = 0),
    * matching DuckDB's `// 0`.
    *
    * 100 TB shape: both rules evaluate map-side on the text scan and
    * contract immediately into ONE |langs|-row rollup of four cell
    * counts; the decision is arithmetic over that contraction.
    * Headroom: (b−c)²·10⁴ rides decimal(38) past 10¹⁶ docs. */
  val qStatMcnemar: Q = (s, d) => {
    val toks = split(lower(col("text")), " ")
    val nWords = size(toks).cast("long")
    val nStop = size(filter(toks,
      t => t.isInCollection(TextQueries.stopwords))).cast("long")
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    Tables.documents(s, d)
      .select(col("lang"),
        (nWords >= 50L && nWords <= 100000L).as("pa"),
        (nStop >= 2L).as("pb"))
      .groupBy(col("lang"))
      .agg(sum(when(col("pa") && col("pb"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("pa") && !col("pb"), 1L).otherwise(0L)).as("a_only"),
        sum(when(!col("pa") && col("pb"), 1L).otherwise(0L)).as("b_only"),
        sum(when(!col("pa") && !col("pb"), 1L).otherwise(0L)).as("n00"))
      .select(col("lang"), col("n11"), col("a_only"), col("b_only"),
        col("n00"),
        expr("""CASE WHEN a_only + b_only > 0 THEN
                CAST((CAST(a_only - b_only AS DECIMAL(38,0))
                  * (a_only - b_only) * 1000000)
                div (a_only + b_only) AS LONG) END""").as("chi2_micro"),
        when(col("a_only") + col("b_only") > 0,
          dec(col("a_only") - col("b_only"))
            * (col("a_only") - col("b_only")) * lit(10000) >
            dec(col("a_only") + col("b_only")) * lit(38415))
          .as("rejected"))
  }

  /** Wilson containment test for a per-type event proportion (share of
    * events with cents ≥ 50000), kept PURELY integer: the Wilson 95%
    * interval is exactly the inversion of the binomial score test, so
    * "is rate p₀ = k% inside the interval" is the cross-multiplied
    * inequality (100x − kn)²·10⁴ ≤ 38416·k·(100−k)·n (1.96²·10⁴ =
    * 38416 exactly) — the rate-SLO monitor ("is this consistent with
    * ≤1%?") without a single float. Emitting the float bounds
    * themselves was tried and REVERTED: the c ± m chain (two
    * divisions, a sqrt, a cancelling subtraction) drifts 1 ULP
    * cross-engine at sf1 — multi-op float chains are not the
    * single-division device (DESIGN.md §7), and this inversion is the
    * exact form the same readout should take.
    *
    * Scale shape: ONE map-side-combinable rollup to |types| rows;
    * everything after is 5-row arithmetic. Headroom: (100x)²·10⁴
    * rides decimal(38) past 10¹⁵ events per type. */
  val qStatWilson: Q = (s, d) => {
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    def inside(k: Int): Column =
      (dec(lit(100) * col("x") - lit(k) * col("n"))
        * (lit(100) * col("x") - lit(k) * col("n")) * lit(10000)
        <= dec(lit(38416L * k * (100 - k))) * col("n"))
    Tables.events(s, d)
      .select(col("event_type"),
        when(cents >= 50000L, 1L).otherwise(0L).as("hit"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("hit")).as("x"))
      .select(col("event_type"), col("n"), col("x"),
        expr("CAST(CAST(x AS DECIMAL(38,0)) * 1000000 div n AS LONG)")
          .as("p_ppm"),
        inside(1).as("consistent_1pct"),
        inside(5).as("consistent_5pct"))
  }

  /** Wald–Wolfowitz runs test on each type's day-over-day direction
    * sequence — "is the daily movement random, or trending/oscillating?"
    * Directions are up (delta > 0) vs down (first day dropped), R =
    * observed runs, and the α = 0.05 two-sided decision
    * (R − μ)² > z²σ² is cross-multiplied into PURE integers:
    * with N = n₁+n₂, A = 2n₁n₂ —
    * ((R−1)·N − A)² · (N−1) · 10⁴ > 38416 · A · (A − N)
    * (μ = A/N + 1, σ² = A(A−N)/(N²(N−1)), 1.96²·10⁴ = 38416; both
    * sides share the N²(N−1) denominator, every operand non-negative
    * since A ≥ N whenever both directions occur). Degenerate sequences
    * (all one direction, or N < 2) read NULL.
    *
    * Scale shape: the (type, day) contraction, then two type-keyed
    * windows (delta sign, run breaks) riding ONE exchange, then the
    * |types|-row fold. Headroom: the decision products ride decimal(38)
    * past 10⁹ days. */
  val qStatRuns: Q = (s, d) => {
    val w = Window.partitionBy("event_type").orderBy("day")
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("v"))
      .withColumn("delta", col("v") - lag("v", 1).over(w))
      .filter(col("delta").isNotNull)
      .withColumn("up", (col("delta") > 0).cast("long"))
      .withColumn("brk",
        when(lag("up", 1).over(w).isNull
          || lag("up", 1).over(w) =!= col("up"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(sum(col("up")).as("n_up"),
        sum(lit(1L) - col("up")).as("n_down"),
        sum(col("brk")).as("runs"))
      .select(col("event_type"), col("n_up"), col("n_down"), col("runs"),
        when(col("n_up") > 0 && col("n_down") > 0,
          dec((col("runs") - 1) * (col("n_up") + col("n_down"))
            - lit(2) * col("n_up") * col("n_down"))
            * ((col("runs") - 1) * (col("n_up") + col("n_down"))
              - lit(2) * col("n_up") * col("n_down"))
            * (col("n_up") + col("n_down") - 1) * lit(10000) >
            dec(lit(38416)) * (lit(2) * col("n_up") * col("n_down"))
              * (lit(2) * col("n_up") * col("n_down")
                - col("n_up") - col("n_down")))
          .as("rejected"))
  }

  /** Cohen's kappa inter-rater agreement (Cohen 1960) between two
    * deterministic per-user labelers — "frequent purchaser" (≥ 14
    * purchase events, above the fixture median) vs "high spender"
    * (total ≥ 3300.00 in exact cents, near the fixture median) — per
    * user-decile bucket: the label-quality check a
    * training pipeline runs over redundant annotators before trusting
    * either. kappa = (p_o − p_e)/(1 − p_e) emitted as EXACT ppm by
    * cross-multiplying through the N² denominator:
    * num = N·(n11+n00) − (ma·mb + (N−ma)·(N−mb)),
    * den = N² − (ma·mb + (N−ma)·(N−mb)), kappa_ppm = 10⁶·num div den —
    * all in decimal(38) (N²·10⁶ stays exact past 10¹⁵ users/bucket).
    * den = 0 (a degenerate marginal, p_e = 1) yields NULL under a CASE
    * guard, matching the statistic's undefined case and DuckDB's `//`.
    *
    * 100 TB shape: one user-keyed rollup (bounded per-user state), then
    * a map-side-combinable contingency rollup to 10 bucket rows. */
  val qEvalKappa: Q = (s, d) => {
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), cents.as("cents"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np"),
        sum(col("cents")).as("tc"))
      .select(col("user_id"),
        (col("np") >= 14L).as("a"), (col("tc") >= 330000L).as("b"))
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("a") && !col("b"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("a") && col("b"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"))
      .select(col("bucket"), col("n"), col("n11"), col("n10"),
        col("n01"), col("n00"),
        expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * n
                  - ((n11+n10) * CAST(n11+n01 AS DECIMAL(38,0))
                     + (n01+n00) * CAST(n10+n00 AS DECIMAL(38,0))) > 0
                THEN CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * (n11+n00)
                  - ((n11+n10) * CAST(n11+n01 AS DECIMAL(38,0))
                     + (n01+n00) * CAST(n10+n00 AS DECIMAL(38,0)))))
                  div (CAST(n AS DECIMAL(38,0)) * n
                  - ((n11+n10) * CAST(n11+n01 AS DECIMAL(38,0))
                     + (n01+n00) * CAST(n10+n00 AS DECIMAL(38,0))))
                  AS LONG) END""").as("kappa_ppm"))
  }

  val queries: Map[String, Q] = Map(
    "q_eval_kappa" -> qEvalKappa,
    "q_bootstrap_ci" -> qBootstrapCi,
    "q_drift_chisq" -> qDriftChisq,
    "q_stat_mcnemar" -> qStatMcnemar,
    "q_stat_wilson" -> qStatWilson,
    "q_stat_runs" -> qStatRuns,
    "q_abtest_anova" -> qAbtestAnova)

  val oracleSql: Map[String, String] = Map(
    "q_eval_kappa" ->
      """WITH per AS (
           SELECT user_id,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               >= 14 AS a,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
               >= 330000 AS b
           FROM events GROUP BY user_id),
         ct AS (
           SELECT user_id % 10 AS bucket, COUNT(*) AS n,
             SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS n11,
             SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS n10,
             SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS n01,
             SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS n00
           FROM per GROUP BY user_id % 10)
         SELECT bucket, CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
           CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
           CAST(n00 AS BIGINT) AS n00,
           CASE WHEN CAST(n AS HUGEINT) * n
                  - ((n11+n10) * CAST(n11+n01 AS HUGEINT)
                     + (n01+n00) * CAST(n10+n00 AS HUGEINT)) > 0
           THEN CAST((1000000 * (CAST(n AS HUGEINT) * (n11+n00)
                  - ((n11+n10) * CAST(n11+n01 AS HUGEINT)
                     + (n01+n00) * CAST(n10+n00 AS HUGEINT))))
                  // (CAST(n AS HUGEINT) * n
                  - ((n11+n10) * CAST(n11+n01 AS HUGEINT)
                     + (n01+n00) * CAST(n10+n00 AS HUGEINT)))
                  AS BIGINT) END AS kappa_ppm
         FROM ct""",
    "q_stat_wilson" ->
      """WITH f AS (
           SELECT event_type, COUNT(*) AS n,
             SUM(CASE WHEN CAST(CAST(value AS DECIMAL(18,2)) * 100
               AS BIGINT) >= 50000 THEN 1 ELSE 0 END) AS x
           FROM events GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n, CAST(x AS BIGINT) AS x,
           CAST(CAST(x AS HUGEINT) * 1000000 // n AS BIGINT) AS p_ppm,
           CAST(100 * x - 1 * n AS HUGEINT) * (100 * x - 1 * n) * 10000
             <= CAST(3803184 AS HUGEINT) * n AS consistent_1pct,
           CAST(100 * x - 5 * n AS HUGEINT) * (100 * x - 5 * n) * 10000
             <= CAST(18247600 AS HUGEINT) * n AS consistent_5pct
         FROM f ORDER BY event_type""",
    "q_stat_runs" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS v
           FROM events GROUP BY 1, 2),
         dlt AS (
           SELECT event_type, day,
             v - LAG(v) OVER (PARTITION BY event_type ORDER BY day)
               AS delta
           FROM daily),
         dir AS (
           SELECT event_type, day,
             CASE WHEN delta > 0 THEN 1 ELSE 0 END AS up
           FROM dlt WHERE delta IS NOT NULL),
         brk AS (
           SELECT event_type, up,
             CASE WHEN LAG(up) OVER (PARTITION BY event_type
                 ORDER BY day) IS DISTINCT FROM up
               THEN 1 ELSE 0 END AS brk
           FROM dir),
         f AS (
           SELECT event_type, SUM(up) AS n_up,
             SUM(1 - up) AS n_down, SUM(brk) AS runs
           FROM brk GROUP BY 1)
         SELECT event_type, CAST(n_up AS BIGINT) AS n_up,
           CAST(n_down AS BIGINT) AS n_down,
           CAST(runs AS BIGINT) AS runs,
           CASE WHEN n_up > 0 AND n_down > 0 THEN
             CAST((runs - 1) * (n_up + n_down)
               - 2 * n_up * n_down AS HUGEINT)
             * ((runs - 1) * (n_up + n_down) - 2 * n_up * n_down)
             * (n_up + n_down - 1) * 10000 >
             CAST(38416 AS HUGEINT) * (2 * n_up * n_down)
               * (2 * n_up * n_down - n_up - n_down)
           END AS rejected
         FROM f ORDER BY event_type""",
    "q_stat_mcnemar" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT)
               AS n_words,
             CAST(len(list_filter(string_split(lower(text), ' '),
               t -> t IN ('the','a','of','and','in','to'))) AS BIGINT)
               AS n_stop
           FROM documents),
         p AS (
           SELECT lang, (n_words BETWEEN 50 AND 100000) AS pa,
             (n_stop >= 2) AS pb
           FROM t),
         f AS (
           SELECT lang,
             SUM(CASE WHEN pa AND pb THEN 1 ELSE 0 END) AS n11,
             SUM(CASE WHEN pa AND NOT pb THEN 1 ELSE 0 END) AS a_only,
             SUM(CASE WHEN NOT pa AND pb THEN 1 ELSE 0 END) AS b_only,
             SUM(CASE WHEN NOT pa AND NOT pb THEN 1 ELSE 0 END) AS n00
           FROM p GROUP BY 1)
         SELECT lang, CAST(n11 AS BIGINT) AS n11,
           CAST(a_only AS BIGINT) AS a_only,
           CAST(b_only AS BIGINT) AS b_only,
           CAST(n00 AS BIGINT) AS n00,
           CASE WHEN a_only + b_only > 0 THEN
             CAST((CAST(a_only - b_only AS HUGEINT)
               * (a_only - b_only) * 1000000)
               // (a_only + b_only) AS BIGINT) END AS chi2_micro,
           CASE WHEN a_only + b_only > 0 THEN
             CAST(a_only - b_only AS HUGEINT) * (a_only - b_only) * 10000
               > CAST(a_only + b_only AS HUGEINT) * 38415 END AS rejected
         FROM f ORDER BY lang""",
    "q_abtest_anova" ->
      """WITH e AS (
           SELECT event_type,
             CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 4)
               AS INT) % 5 AS arm,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events),
         a AS (
           SELECT event_type, arm, COUNT(*) AS nj,
             CAST(SUM(cents) AS BIGINT) AS sj,
             SUM(CAST(cents AS HUGEINT) * cents) AS qj
           FROM e GROUP BY 1, 2),
         g AS (
           SELECT event_type, CAST(SUM(nj) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(sj) AS HUGEINT) AS stot,
             SUM((CAST(sj AS HUGEINT) * sj) // nj) AS sb_part,
             SUM((CAST(nj AS HUGEINT) * qj
                  - CAST(sj AS HUGEINT) * sj) // nj) AS sswd
           FROM a GROUP BY 1),
         f AS (
           SELECT event_type, n, k,
             sb_part - (stot * stot) // n AS ssbd, sswd,
             CASE k WHEN 2 THEN 38415 WHEN 3 THEN 29957
                    WHEN 4 THEN 26049 ELSE 23719 END AS crit4
           FROM g)
         SELECT event_type, n, k AS k_arms,
           CAST(ssbd AS BIGINT) AS ssb_q, CAST(sswd AS BIGINT) AS ssw_q,
           CASE WHEN sswd > 0 AND k > 1
             THEN CAST((ssbd * (n - k) * 1000) // (sswd * (k - 1))
               AS BIGINT) END AS f_milli,
           CASE WHEN sswd > 0 AND k > 1
             THEN ssbd * (n - k) * 10000 > crit4 * sswd * (k - 1)
             END AS rejected
         FROM f ORDER BY event_type""",
    "q_bootstrap_ci" ->
      """WITH reps AS (
           SELECT event_type, event_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             unnest(generate_series(0, 31)) AS r
           FROM events),
         drawn AS (
           SELECT event_type, r, cents,
             CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)
                 || '#boot' || CAST(r // 5 AS VARCHAR)),
                 CAST(1 + 6 * (r % 5) AS INT), 6)) AS BIGINT) AS h
           FROM reps),
         w AS (
           SELECT event_type, r, cents,
             (CASE WHEN h >= 6171992 THEN 1 ELSE 0 END
              + CASE WHEN h >= 12343985 THEN 1 ELSE 0 END
              + CASE WHEN h >= 15429982 THEN 1 ELSE 0 END
              + CASE WHEN h >= 16458647 THEN 1 ELSE 0 END
              + CASE WHEN h >= 16715813 THEN 1 ELSE 0 END
              + CASE WHEN h >= 16767247 THEN 1 ELSE 0 END
              + CASE WHEN h >= 16775819 THEN 1 ELSE 0 END
              + CASE WHEN h >= 16777044 THEN 1 ELSE 0 END
              + CASE WHEN h >= 16777197 THEN 1 ELSE 0 END) AS w
           FROM drawn),
         m AS (
           SELECT event_type, r, SUM(w) AS sw,
             SUM(CAST(w AS HUGEINT) * cents) AS swc
           FROM w GROUP BY event_type, r),
         mm AS (
           SELECT event_type, r,
             CAST((swc * 1000) // sw AS BIGINT) AS mean_milli
           FROM m WHERE sw > 0),
         rk AS (
           SELECT event_type, mean_milli,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY mean_milli ASC, r ASC) AS rk_lo,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY mean_milli DESC, r DESC) AS rk_hi
           FROM mm)
         SELECT event_type, COUNT(*) AS n_replicas,
           MAX(CASE WHEN rk_lo = 2 THEN mean_milli END) AS lo_milli,
           MAX(CASE WHEN rk_hi = 2 THEN mean_milli END) AS hi_milli
         FROM rk GROUP BY event_type ORDER BY event_type""",
    "q_drift_chisq" ->
      """WITH o AS (
           SELECT event_type,
             CAST(SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END)
               AS BIGINT) AS o1,
             CAST(SUM(CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END)
               AS BIGINT) AS o2
           FROM events GROUP BY event_type),
         t AS (
           SELECT event_type, o1, o2,
             SUM(o1) OVER () AS n1, SUM(o2) OVER () AS n2,
             CAST(o1 AS HUGEINT) * SUM(o2) OVER ()
               - CAST(o2 AS HUGEINT) * SUM(o1) OVER () AS dd
           FROM o),
         c AS (
           SELECT event_type, o1, o2, dd,
             ((o1 + o2) * CAST(n1 AS HUGEINT) * n2) // 1000000 AS den_micro
           FROM t)
         SELECT event_type, o1, o2,
           CASE WHEN den_micro > 0
             THEN CAST((dd * dd) // den_micro AS BIGINT) END
             AS contrib_micro,
           CASE WHEN den_micro > 0
             THEN CAST((dd * dd) // den_micro AS BIGINT) END
             > 3841000 AS drifted
         FROM c ORDER BY event_type""")
}
