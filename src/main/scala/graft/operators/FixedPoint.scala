package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Shared machinery for the exact fixed-point numeric layer — the device
  * that moves float-fold queries (trig, logs) under the cross-engine
  * hash gate. Transcendental functions are not correctly-rounded IEEE
  * ops, so Spark (Java Math) and DuckDB (libm) disagree in the last
  * ulps; this layer instead DEFINES each query's transcendental as a
  * truncated-series fixed-point integer computation at scale 10¹⁸,
  * generated from ONE (name, expression) stage list that the Spark side
  * folds as `withColumn`s and the DuckDB oracle nests as subselects —
  * identical arithmetic by construction, exact in DECIMAL(38,0) /
  * HUGEINT (every intermediate is provably < 10³⁸, every integer
  * division has non-negative operands so trunc = floor in both
  * dialects). Fidelity bounds vs the true function are documented at
  * each stage builder; the cross-engine guarantee needs none — both
  * engines compute the same integers bit-exactly.
  */
object FixedPoint {

  /** SQL dialect pair so Spark and DuckDB run the SAME generated
    * arithmetic: Spark stages in DECIMAL(38,0) with `div`, DuckDB in
    * HUGEINT with `//`. */
  final case class IntDialect(big: String, idiv: String)
  val SparkFp: IntDialect = IntDialect("DECIMAL(38,0)", "div")
  val DuckFp: IntDialect = IntDialect("HUGEINT", "//")

  /** Fixed-point scale: 10¹⁸. */
  val FpScale = "1000000000000000000"

  /** round(ln 2 · 10¹⁸). */
  val Ln2Fp = "693147180559945309"

  /** Apply staged SQL definitions as chained columns (Spark side). */
  def withStages(df: DataFrame, stages: Seq[(String, String)]): DataFrame =
    stages.foldLeft(df) { case (acc, (n, sql)) =>
      acc.withColumn(n, expr(sql))
    }

  /** Nest staged SQL definitions as chained subselects (DuckDB side) —
    * the SAME (name, expression) list as the Spark fold, so the two
    * engines cannot drift. */
  def nestStages(base: String, stages: Seq[(String, String)]): String =
    stages.foldLeft(base) { case (acc, (n, sql)) =>
      s"SELECT *, ($sql) AS $n FROM ($acc)"
    }

  /** Driver-side mirror of [[lnFpStages]] — the SAME integer algorithm
    * (same binary reduction, same truncating divisions, so bit-equal
    * results; FixedPointSpec pins it against the staged form) — for
    * corpus-level scalars the driver already holds: staging a 30-stage
    * chain over a LITERAL column costs seconds of Catalyst constant
    * folding per plan build (q_quality_logistic paid 16 s for six such
    * chains), where this fold is microseconds. Data-dependent columns
    * still go through [[lnFpStages]]. */
  def lnFpScala(n: Long): BigInt = {
    require(n >= 1, s"lnFpScala: n must be positive, got $n")
    val S = BigInt(10).pow(18)
    var k = 0
    var p = BigInt(1)
    var nn = BigInt(n)
    for (b <- Seq(32, 16, 8, 4, 2, 1)) {
      val pow = BigInt(1) << b
      if (nn >= pow) { k += b; p *= pow; nn /= pow }
    }
    val m = (BigInt(n) * S) / p
    val z = ((m - S) * S) / (m + S)
    val z2 = (z * z) / S
    var prev = z
    var sum = z
    for (e <- Seq(3, 5, 7, 9, 11, 13, 15, 17)) {
      prev = (prev * z2) / S
      sum += prev / e
    }
    BigInt(k) * BigInt(Ln2Fp) + 2 * sum
  }

  /** Render staged definitions as a flat comma-joined CTE chain — the
    * DuckDB-side alternative to [[nestStages]] when the combined stage
    * count would blow the parser's subquery-nesting stack (~180 levels
    * did; a flat CTE list is unbounded). Returns the fragment to splice
    * into the outer WITH and the last CTE's name. */
  def cteStages(baseName: String, stages: Seq[(String, String)],
      pre: String): (String, String) = {
    require(stages.nonEmpty,
      s"cteStages($baseName, _, $pre): empty stage list would emit a " +
        "dangling reference to a CTE that was never defined")
    val frags = stages.zipWithIndex.map { case ((n, sql), i) =>
      val prev = if (i == 0) baseName else s"${pre}_${i - 1}"
      s"${pre}_$i AS (SELECT *, ($sql) AS $n FROM $prev)"
    }
    (frags.mkString(",\n         "), s"${pre}_${stages.size - 1}")
  }

  /** Stages deriving `{p}ln` = trunc-series ln(n)·10¹⁸ for a POSITIVE
    * BIGINT column `n` (any value up to 2⁶³−1):
    *
    *  1. binary range reduction in pure integer CASEs — peel powers
    *     2³²,2¹⁶,…,2¹ so `{p}k6` = ⌊log₂ n⌋ and `{p}p6` = 2^k (never a
    *     float log2, whose floor can flip cross-engine at exact powers);
    *  2. mantissa m = n·10¹⁸ / 2^k ∈ [10¹⁸, 2·10¹⁸);
    *  3. atanh series: z = (m−1)/(m+1) ≤ 1/3 at the scale, ln m =
    *     2(z + z³/3 + … + z¹⁷/17) — truncation z¹⁹/19 < 4.6·10⁻¹¹;
    *  4. ln n = k·[[Ln2Fp]] + ln m (DECIMAL/HUGEINT — k·ln2 can pass
    *     int64 for n > 2⁵³).
    *
    * Fidelity: < 5·10⁻¹¹ relative vs true ln; the declared output grain
    * of its consumers (micro-nats) is 10⁵× coarser. ln(1) = 0 exactly —
    * consumers use that for left-join smoothing fallbacks. */
  def lnFpStages(n: String, p: String, dl: IntDialect)
      : Seq[(String, String)] = {
    import dl.{big, idiv}
    def c(x: String) = s"CAST(($x) AS $big)"
    val bits = Seq(32, 16, 8, 4, 2, 1)
    val red = bits.zipWithIndex.flatMap { case (b, i0) =>
      val i = i0 + 1
      val (nPrev, kPrev, pPrev) =
        if (i == 1) (s"CAST(($n) AS BIGINT)", "CAST(0 AS BIGINT)",
          "CAST(1 AS BIGINT)")
        else (s"${p}n${i - 1}", s"${p}k${i - 1}", s"${p}p${i - 1}")
      val pow = (BigInt(1) << b).toString
      Seq(
        s"${p}k$i" ->
          s"($kPrev) + (CASE WHEN ($nPrev) >= $pow THEN $b ELSE 0 END)",
        s"${p}p$i" ->
          s"($pPrev) * (CASE WHEN ($nPrev) >= $pow THEN $pow ELSE 1 END)",
        s"${p}n$i" -> (s"CASE WHEN ($nPrev) >= $pow " +
          s"THEN ($nPrev) $idiv $pow ELSE ($nPrev) END"))
    }
    val z = s"${p}z"; val z2 = s"${p}z2"
    val oddPows = Seq(3, 5, 7, 9, 11, 13, 15, 17)
    val powStages = oddPows.zipWithIndex.map { case (e, j) =>
      val prev = if (j == 0) z else s"${p}z${oddPows(j - 1)}"
      s"${p}z$e" -> s"(${c(prev)} * $z2) $idiv $FpScale"
    }
    red ++ Seq(
      s"${p}m" -> s"(${c(n)} * $FpScale) $idiv (${p}p6)",
      z -> (s"(${c(s"(${p}m) - $FpScale")} * $FpScale) $idiv " +
        s"((${p}m) + $FpScale)"),
      z2 -> s"(${c(z)} * $z) $idiv $FpScale") ++
      powStages ++ Seq(
      s"${p}lnm" -> ("2 * ((" + z + ") + " + oddPows.map(e =>
        s"((${p}z$e) $idiv $e)").mkString(" + ") + ")"),
      s"${p}ln" -> s"${c(s"${p}k6")} * $Ln2Fp + (${p}lnm)")
  }
}
