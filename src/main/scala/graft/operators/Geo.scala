package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Spatial operators for the mobility domain. The reference's GTFS zips
  * carry stop coordinates per the public GTFS spec (stops.txt
  * `stop_lat`/`stop_lon`); transit analytics needs "stops near a point"
  * and "stop pairs within walking distance" over them. The engine's
  * fixture tables have no coordinate column, so the declared queries
  * derive deterministic md5-based microdegree coordinates from stable
  * keys — the same derived-fixture pattern as `q_fill_forward`'s sparse
  * readings — and the operators themselves take any (id, x, y) frame.
  *
  * Coordinates are INTEGER grid units (microdegrees): every cell id and
  * squared distance is exact 64-bit arithmetic, identical in Spark and
  * DuckDB, so both declared queries sit under the exact-hash oracle gate
  * (no floating trig — a production haversine layer belongs above this
  * integer-exact core, which is the join machinery).
  *
  * 100 TB shape (the spatial join): bucket points into radius-sized grid
  * cells, explode each LEFT point to its 3×3 neighbor cells (constant
  * factor 9), equi-join on the cell key, verify the exact squared
  * distance. Cost is linear in points × local density — NEVER an
  * all-pairs cross join; identical in spirit to the LSH band-join dedup
  * path, with the grid as the locality-sensitive bucketing.
  */
object Geo {

  /** Deterministic microdegree coordinate in [0, range) derived from an
    * id column — 8 md5 hex digits → BIGINT → mod. */
  def derivedCoord(idCol: Column, salt: String, range: Long): Column =
    pmod(graft.functions.Md5Draws24.md5Prefix(
      concat(idCol.cast(StringType), lit(salt)), 8), lit(range))

  /** Grid cell id for integer coordinates at `cell` spacing: a single
    * BIGINT key packing (x/cell, y/cell). `coordSpan` bounds the
    * coordinate range so the packed key cannot collide. */
  def gridCell(xU: Column, yU: Column, cell: Long,
      coordSpan: Long = 100000000L): Column =
    floor(xU / cell).cast(LongType) * lit(2 * coordSpan / cell) +
      floor(yU / cell).cast(LongType)

  /** All unordered pairs (a < b) of `points` (idCol, xCol, yCol — integer
    * units) whose squared euclidean distance is ≤ radius². Cell size =
    * radius, so any qualifying pair shares a cell or sits in adjacent
    * cells; the 3×3 neighbor explode on one side makes every such pair
    * meet on an equality key exactly once (pair emitted from the LEFT
    * point's true cell joined to the RIGHT point's cell). */
  def neighborPairs(points: DataFrame, idCol: String, xCol: String,
      yCol: String, radius: Long): DataFrame = {
    val cell = radius
    val pts = points.select(col(idCol).as("id"),
      col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
    val right = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"),
      gridCell(col("x"), col("y"), cell).as("cell"))
    val span = 100000000L
    val rowStride = 2 * span / cell
    // degenerate-radius guard (ADVICE r16): at rowStride <= 2 (radius >=
    // half the coordinate span) the 5 forward offsets stop being pairwise
    // distinct — {0,1,rowStride-1,rowStride,rowStride+1} collapses onto
    // duplicate keys, so a pair would meet on TWO identical exploded
    // cells and be emitted twice. Fail loudly instead of silently
    // duplicating; a radius that large means "compare everything" and
    // needs no grid blocking in the first place.
    require(rowStride > 2,
      s"neighborPairs: radius=$radius yields rowStride=$rowStride <= 2 — " +
        "grid offsets degenerate (duplicate join keys); use a smaller " +
        "radius or an all-pairs join for radii >= half the coord span")
    // forward-half blocking (r16, same device as the haversine query):
    // explode only the 5 lexicographically-forward offsets — an
    // antisymmetric set, so each unordered cross-cell pair meets on
    // exactly one equality key and only same-cell pairs need the id
    // tiebreak; ids normalized least/greatest below. 5|pts| join probes
    // instead of 9|pts|, identical result set.
    val offsets = Seq(0L, 1L, rowStride - 1, rowStride, rowStride + 1)
    val left = pts.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), gridCell(col("x"), col("y"), cell).as("cell0"))
      .withColumn("off", explode(array(offsets.map(lit): _*)))
      .withColumn("cell", col("cell0") + col("off"))
    left.join(right, "cell")
      .filter(col("off") =!= 0L || col("id_a") < col("id_b"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb"))
        <= lit(radius * radius))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("dist_sq"))
    // no distinct needed: the exploded offset keys are pairwise
    // different, so a qualifying pair meets on exactly one equality key
  }

  // ---- great-circle layer over the integer-exact core ------------------
  //
  // The GTFS domain is lat/lon degrees (stops.txt per the public spec),
  // where euclidean microdegrees misstate east-west distance by cos(lat)
  // (~36% at Warsaw's 52°N). The haversine layer computes TRUE
  // great-circle meters; it is float (sin/cos/asin), so its queries sit
  // in the no-oracle class (property-tested against a plain-Scala
  // formula and a brute-force sweep — AnalyticsOpsSpec), while the
  // integer grid stays the bucketing layer underneath the join exactly
  // as before: coarse candidate cells from exact integer arithmetic,
  // exact-enough float verification on the original doubles above it.

  /** IUGG mean earth radius, meters. */
  val EarthRadiusM = 6371008.8

  private val MetersPerDegLat = math.Pi * EarthRadiusM / 180.0 // ≈111195

  /** Great-circle distance in METERS between two (lat, lon) degree
    * pairs — the haversine formula on codegen'd built-ins (no UDF):
    * a = sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2), d = 2R·asin(√a), with √a
    * clamped to 1 against float drift on antipodal pairs. NULL in =
    * NULL out (the clamp is guarded: `least` alone would swallow the
    * NULL and return asin(1) — half the planet away). */
  def haversineMeters(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    // squares via self-multiplication, not pow(x, 2): Math.pow is a
    // transcendental-path call per candidate pair in the join's hot
    // verify loop, ~an order of magnitude slower than a multiply
    val sLat = sin(radians(lat2 - lat1) / 2)
    val sLon = sin(radians(lon2 - lon1) / 2)
    val a = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * (sLon * sLon)
    when(a.isNull, lit(null).cast(DoubleType))
      .otherwise(lit(2 * EarthRadiusM) * asin(least(lit(1.0), sqrt(a))))
  }

  /** All unordered pairs (a < b) of `points` (idCol + lat/lon DEGREE
    * columns) within `radiusMeters` great-circle distance, with the
    * distance. Same join machinery as [[neighborPairs]] — integer
    * microdegree grid cells as the bucketing layer, 3×3 neighbor explode
    * on one side, equality join, exact verification — but the cell
    * spacing is derived from spherical bounds so recall is total:
    * latitude from d ≥ R·|Δφ|, longitude from
    * sin(d/2R) ≥ cos(φ)·|sin(Δλ/2)| at the patch's worst-case
    * |lat| = `maxAbsLatDeg` (the operator REQUIRES all points inside
    * that band; 66° covers every human-mobility dataset short of
    * Svalbard). Lat and lon cells are sized separately and joined as a
    * two-column key — longitude cells widen toward the poles instead of
    * inflating the whole grid. Assumes the patch does not cross the
    * antimeridian (lon discontinuity at ±180°), the standard caveat of
    * grid-bucketed spatial joins. */
  def haversineNeighborPairs(points: DataFrame, idCol: String,
      latCol: String, lonCol: String, radiusMeters: Double,
      maxAbsLatDeg: Double = 66.0): DataFrame = {
    require(radiusMeters > 0 && maxAbsLatDeg >= 0 && maxAbsLatDeg < 90)
    val cosBound = math.cos(math.toRadians(maxAbsLatDeg))
    val sinHalf = math.sin(radiusMeters / (2 * EarthRadiusM)) / cosBound
    require(sinHalf < 1,
      s"radius ${radiusMeters}m degenerates the grid at |lat| <= $maxAbsLatDeg")
    // +1 µdeg absorbs the floor()-to-integer slop on each coordinate
    val latCellU = math.ceil(radiusMeters / MetersPerDegLat * 1e6).toLong + 1
    val lonCellU = math.ceil(
      math.toDegrees(2 * math.asin(sinHalf)) * 1e6).toLong + 1
    // The |lat| <= maxAbsLatDeg precondition is a RECALL bound (cell
    // widths are sized from cos(maxAbsLat)), so a violating point would
    // silently drop qualifying pairs — enforce it inline on the scan:
    // raise_error costs nothing on conforming data (codegen'd branch)
    // and turns the violation into a loud failure instead of quiet
    // under-recall.
    val latChecked = when(
      abs(col(latCol).cast(DoubleType)) > lit(maxAbsLatDeg),
      raise_error(concat(lit(s"haversineNeighborPairs: |lat| > " +
        s"$maxAbsLatDeg deg violates the grid recall bound (got "),
        col(latCol).cast(StringType), lit(")"))).cast(DoubleType))
      .otherwise(col(latCol).cast(DoubleType))
    val pts = points.select(col(idCol).as("id"),
      latChecked.as("lat"),
      col(lonCol).cast(DoubleType).as("lon"),
      floor(latChecked * 1e6 / latCellU)
        .cast(LongType).as("cla"),
      floor(col(lonCol).cast(DoubleType) * 1e6 / lonCellU)
        .cast(LongType).as("clo"))
    val right = pts.select(col("id").as("id_b"), col("lat").as("lat_b"),
      col("lon").as("lon_b"), col("cla"), col("clo"))
    // forward-half blocking, like [[neighborPairs]]: 5 probes per point
    // instead of 9, same result set
    val offsets = Seq((0L, 0L), (0L, 1L), (1L, -1L), (1L, 0L), (1L, 1L))
      .map { case (dx, dy) => struct(lit(dx).as("dx"), lit(dy).as("dy")) }
    val left = pts.select(col("id").as("id_a"), col("lat").as("lat_a"),
        col("lon").as("lon_a"), col("cla").as("cla0"), col("clo").as("clo0"))
      .withColumn("off", explode(array(offsets: _*)))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        (col("cla0") + col("off.dx")).as("cla"),
        (col("clo0") + col("off.dy")).as("clo"),
        (col("off.dx") === 0L && col("off.dy") === 0L).as("same_cell"))
    left.join(right, Seq("cla", "clo"))
      .filter(!col("same_cell") || col("id_a") < col("id_b"))
      .withColumn("dist_m", haversineMeters(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")))
      .filter(col("dist_m") <= radiusMeters)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("dist_m"))
    // like neighborPairs: the exploded offset keys are pairwise
    // distinct, so a qualifying pair meets on exactly one (cla, clo) key
  }

  // ---- exact fixed-point great-circle layer (oracle-bearing) -----------
  //
  // The float haversine above can never sit under the cross-engine hash
  // gate: sin/cos/asin are not correctly-rounded IEEE ops, so Spark (Java
  // Math) and DuckDB (libm) disagree in the last ulps. This layer instead
  // DEFINES the declared queries' great-circle distance as a fixed-point
  // integer computation — truncated odd/even Taylor series for sin/cos at
  // scale 10¹⁸, every step exact 128-bit integer arithmetic with declared
  // truncating division — so both engines compute bit-identical values
  // (the q_similarity_topk / q_eval_ndcg integer-quantization device).
  // Fidelity vs the true haversine: the patch spans < 1.6°, so series
  // truncation (< 10⁻¹³ rel), the pinned RAD constant (3.2·10⁻¹² rel) and
  // the 10⁻¹⁸-grain division truncations put the defined distance within
  // ~1 µm of the true great-circle value at patch scale; the declared
  // output grain is millimeter truncation. The only float ops kept are
  // BIGINT→DOUBLE cast and sqrt — both correctly rounded per IEEE 754,
  // hence bit-identical cross-engine (unlike the trig they replace).

  import FixedPoint.{IntDialect, SparkFp, DuckFp, FpScale, withStages,
    nestStages}

  /** round(π/180e6 · 10¹⁸) — radians per microdegree at the scale. */
  private val RadPerUdegFp = "17453292520"

  /** 4·R²·10⁶ mm² with R = 6371008.8 m — exact (R² terminates). */
  private val FourR2Mm2 = "162359012518709760000"

  /** Stages deriving the fixed-point 3D UNIT VECTOR (`{p}x`,`{p}y`,
    * `{p}z`, each ·10¹⁸) of a point from integer-µdeg `latU`/`lonU`:
    * sin by x − x³/6 + x⁵/120 and cos by 1 − x²/2 + x⁴/24 − x⁶/720
    * (angles < 0.028 rad on the patch ⇒ truncation < 10⁻¹⁶ abs), then
    * x = cosφ·cosλ, y = cosφ·sinλ, z = sinφ. ALL trig sits here on the
    * per-point side — the per-pair side ([[chordD2Stages]]) is three
    * subtractions and squares, which keeps the join's generated consume
    * method far under janino's 64 KB limit (the direct per-pair sin
    * series blew it and forced a whole-stage-codegen fallback). */
  private[operators] def unitVecStages(latU: String, lonU: String,
      p: String, dl: IntDialect): Seq[(String, String)] = {
    import dl.{big, idiv}
    def c(x: String) = s"CAST(($x) AS $big)"
    // r17 narrowing: on the declared patch (|angle| < 0.03 rad ⇒
    // w < 3·10¹⁶) every post-division intermediate provably fits
    // BIGINT — w2 < 9·10¹⁴, w3 < 2.7·10¹³, w4 < 2.7·10¹¹, w5/w6
    // smaller, sin/cos ≤ 10¹⁸, x/y ≤ 10¹⁸ — so each stage CASTs its
    // result to BIGINT after the one decimal/HUGEINT product that
    // needs the headroom. Identical integers in both dialects (the
    // casts are exact for in-range values); on the Spark side the
    // series arithmetic then runs in long instead of BigDecimal,
    // which is what made the staged trig a per-event cost in the
    // trajectory query (12 decimal mult/div per point before).
    def trig(pre: String, u: String) = Seq(
      s"${pre}w" -> s"CAST(($u) * $RadPerUdegFp AS BIGINT)",
      s"${pre}w2" ->
        s"CAST((${c(s"${pre}w")} * ${pre}w) $idiv $FpScale AS BIGINT)",
      s"${pre}w3" ->
        s"CAST((${c(s"${pre}w2")} * ${pre}w) $idiv $FpScale AS BIGINT)",
      s"${pre}w4" ->
        s"CAST((${c(s"${pre}w2")} * ${pre}w2) $idiv $FpScale AS BIGINT)",
      s"${pre}w5" ->
        s"CAST((${c(s"${pre}w4")} * ${pre}w) $idiv $FpScale AS BIGINT)",
      s"${pre}w6" ->
        s"CAST((${c(s"${pre}w4")} * ${pre}w2) $idiv $FpScale AS BIGINT)",
      s"${pre}sin" ->
        s"(${pre}w) - (${pre}w3 $idiv 6) + (${pre}w5 $idiv 120)",
      s"${pre}cos" -> (s"$FpScale - (${pre}w2 $idiv 2) + " +
        s"(${pre}w4 $idiv 24) - (${pre}w6 $idiv 720)"))
    trig(s"${p}a_", latU) ++ trig(s"${p}o_", lonU) ++ Seq(
      s"${p}x" ->
        s"CAST((${c(s"${p}a_cos")} * ${p}o_cos) $idiv $FpScale AS BIGINT)",
      s"${p}y" ->
        s"CAST((${c(s"${p}a_cos")} * ${p}o_sin) $idiv $FpScale AS BIGINT)",
      s"${p}z" -> s"CAST(${p}a_sin AS BIGINT)")
  }

  /** Stages from two staged unit vectors to `d2_mm2` — the squared
    * great-circle distance in mm² as BIGINT: chord² = |v₁−v₂|² (scale
    * 10³⁶), the haversine value a = chord²/4 (exact identity), and
    * d² = 4R²·asin²(√a) expanded as 4R²·(a + a²/3 + 8a³/45) — the
    * square of the asin series, so no float asin anywhere. NULL inputs
    * propagate to NULL. Every intermediate < 1.3·10³³ < 10³⁸. */
  private[operators] def chordD2Stages(x1: String, y1: String, z1: String,
      x2: String, y2: String, z2: String,
      dl: IntDialect): Seq[(String, String)] = {
    import dl.{big, idiv}
    def c(x: String) = s"CAST(($x) AS $big)"
    // r17 narrowing (same device as [[unitVecStages]]): with the patch
    // envelope c2 < 1.3·10³³, a_fp < 3.3·10¹⁴, a_2 < 1.1·10¹¹ and
    // a_2·a_fp div 10¹⁸ < 3.6·10⁷ all fit BIGINT, so each stage casts
    // down after its one wide product and the series/compare arithmetic
    // runs in long. The staged VALUES are unchanged in both dialects
    // (exact in-range casts); the a_2·a_fp cube term gets its own
    // stage (`a_3t`) so the cast happens once.
    Seq(
      "dx" -> s"CAST(($x1) - ($x2) AS BIGINT)",
      "dy" -> s"CAST(($y1) - ($y2) AS BIGINT)",
      "dz" -> s"CAST(($z1) - ($z2) AS BIGINT)",
      "c2" -> (s"(${c("dx")} * dx) + (${c("dy")} * dy) + " +
        s"(${c("dz")} * dz)"),
      "a_fp" -> s"CAST(${c("c2")} $idiv 4000000000000000000 AS BIGINT)",
      "a_2" -> s"CAST((${c("a_fp")} * a_fp) $idiv $FpScale AS BIGINT)",
      "a_3t" -> s"CAST((${c("a_2")} * a_fp) $idiv $FpScale AS BIGINT)",
      "a_sq" -> s"a_fp + (a_2 $idiv 3) + ((8 * a_3t) $idiv 45)",
      "d2_mm2" -> s"CAST((${c(FourR2Mm2)} * a_sq) $idiv $FpScale AS BIGINT)")
  }

  /** Declared radius for the exact haversine neighbor query, meters. */
  private val HavRadiusM = 1200.0

  /** mm² filter threshold for [[HavRadiusM]]. */
  private val HavRadiusMm2 = {
    val mm = (HavRadiusM * 1000).toLong; mm * mm
  }

  /** Grid cell sizes (µdeg) giving total recall at [[HavRadiusM]] for a
    * patch within |lat| ≤ 2° (the derived fixture spans [0, 1)°):
    * latitude from d ≥ R|Δφ|, longitude from
    * sin(d/2R) ≥ cos(2°)|sin(Δλ/2)|; +1 µdeg absorbs integer slop and
    * the < 1 µm quantized-vs-true divergence. */
  private val HavLatCellU: Long =
    math.ceil(HavRadiusM / MetersPerDegLat * 1e6).toLong + 1
  private val HavLonCellU: Long = math.ceil(math.toDegrees(2 * math.asin(
    math.sin(HavRadiusM / (2 * EarthRadiusM)) /
      math.cos(math.toRadians(2.0)))) * 1e6).toLong + 1

  type Q = (SparkSession, String) => DataFrame

  private val Range = 1000000L // 1°×1° patch in microdegrees

  private def customerPoints(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      derivedCoord(col("c_custkey"), "#lat", Range).as("lat_u"),
      derivedCoord(col("c_custkey"), "#lon", Range).as("lon_u"))

  private val vecCache =
    scala.collection.concurrent.TrieMap[String, DataFrame]()

  /** Drop cached unit-vector artifacts (see
    * [[DedupQueries.clearArtifacts]]). Checkpointed frames release via
    * GC. */
  def clearArtifacts(): Unit = vecCache.clear()

  /** Session artifact: customer unit vectors + spherical-bound grid
    * cells, eagerly checkpointed once per (session, corpus). The staged
    * trig collapses into wide duplicated projections when inlined on
    * BOTH sides of the pair self-join (CollapseProject re-substitutes
    * shared stage references), so materializing the |customers|-row
    * point table once is both the steady-state win and the 100 TB shape
    * — unit vectors are a per-corpus ingest artifact, like IVF
    * centroids. */
  private def customerVecPts(s: SparkSession, d: String): DataFrame =
    Artifacts.memo(vecCache, s"${System.identityHashCode(s)}:$d") {
      withStages(customerPoints(s, d),
          unitVecStages("lat_u", "lon_u", "v", SparkFp))
        .select(col("c_custkey"), col("vx"), col("vy"), col("vz"),
          expr(s"lat_u div $HavLatCellU").as("cla"),
          expr(s"lon_u div $HavLonCellU").as("clo"))
        .localCheckpoint(true)
    }

  /** Declared query: derived customer points with their 10000-µdeg grid
    * cell — the bucketing layer of the spatial join, exact integers. */
  val qGeoCell: Q = (s, d) =>
    customerPoints(s, d)
      .withColumn("cell", gridCell(col("lat_u"), col("lon_u"), 10000L))

  /** Declared query: customer pairs within 10000 µdeg (≈1.1 km N-S). */
  val qGeoNeighbors: Q = (s, d) =>
    neighborPairs(customerPoints(s, d), "c_custkey", "lat_u", "lon_u",
      radius = 10000L)

  /** Declared query: per-user trajectory stats — Manhattan step distance
    * between consecutive events (derived per-event coordinates, exact
    * integers), total distance traveled, longest hop. The
    * distance-traveled rollup of a vehicle/user trace; Manhattan keeps
    * the whole pipeline in exact 64-bit arithmetic (a euclidean layer
    * needs sqrt and belongs above the exact core).
    *
    * Scale shape: one user-keyed window (lag) whose hash partitioning the
    * following groupBy reuses — a single wide exchange, same plan family
    * as the behavioral funnel. */
  val qGeoTrajectory: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
      col("event_id"),
      derivedCoord(col("event_id"), "#lat", Range).as("lat_u"),
      derivedCoord(col("event_id"), "#lon", Range).as("lon_u"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("step",
        abs(col("lat_u") - lag("lat_u", 1).over(w)) +
          abs(col("lon_u") - lag("lon_u", 1).over(w)))
      .groupBy("user_id")
      .agg(count(col("step")).as("n_moves"),
        coalesce(sum("step"), lit(0L)).as("dist_total"),
        max("step").as("max_step"))
  }

  /** Declared query: trip/stop segmentation (dwell detection) — the
    * transit-analytics primitive: split each user's trace into segments
    * wherever the Manhattan step to the previous event exceeds a
    * movement threshold; within a segment the entity is "dwelling".
    * Segment id = running count of breaks (an exact integer cumsum over
    * the same user-keyed window the step computation uses), so the whole
    * query is one wide exchange; segments then aggregate on the window's
    * own partitioning. */
  val qGeoDwell: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
      col("event_id"),
      derivedCoord(col("event_id"), "#lat", Range).as("lat_u"),
      derivedCoord(col("event_id"), "#lon", Range).as("lon_u"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("step",
        abs(col("lat_u") - lag("lat_u", 1).over(w)) +
          abs(col("lon_u") - lag("lon_u", 1).over(w)))
      .withColumn("brk",
        when(col("step").isNull || col("step") > lit(700000L), 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("seg"))
      .agg(count(lit(1)).as("n_events"),
        min(col("event_id")).as("min_event_id"),
        max(col("event_id")).as("max_event_id"))
  }

  /** Declared query (oracle-bearing since r15 — the fixed-point
    * great-circle layer replaced the float-fold form): customer pairs
    * within [[HavRadiusM]] great-circle distance over the derived
    * degree coordinates, with the distance in integer millimeters
    * (floor(√d2_mm2): cast + sqrt are correctly-rounded IEEE ops and
    * d2_mm2 < 2⁴¹ here, so exact cross-engine). Same grid machinery as
    * [[neighborPairs]] — spherical-bound cells, FORWARD-HALF neighbor
    * explode, equality join — with the exact filter on the fixed-point
    * mm². Forward-half blocking (r16): instead of all 9 offsets halved
    * by id_a < id_b AFTER the join, the left side explodes only the 5
    * lexicographically-forward offsets {(0,0),(0,1),(1,−1),(1,0),(1,1)}
    * — an antisymmetric set (exactly one of ±v for every v ≠ 0), so
    * every unordered cross-cell pair is generated exactly once and only
    * same-cell pairs need the id tiebreak; ids are normalized
    * least/greatest at the end. Candidate volume drops from 9|pts| to
    * 5|pts| join probes with an identical result set (the oracle's
    * 9-offset form pins that). The float [[haversineNeighborPairs]]
    * stays the library surface for arbitrary patches (property-tested
    * in AnalyticsOpsSpec). */
  val qGeoNeighborsHaversine: Q = (s, d) => {
    val pts = customerVecPts(s, d)
    val right = pts.select(col("c_custkey").as("id_b"),
      col("vx").as("x_b"), col("vy").as("y_b"), col("vz").as("z_b"),
      col("cla"), col("clo"))
    val offs = Seq((0, 0), (0, 1), (1, -1), (1, 0), (1, 1)).map {
      case (dx, dy) => struct(lit(dx).as("dx"), lit(dy).as("dy"))
    }
    val left = pts.select(col("c_custkey").as("id_a"),
        col("vx").as("x_a"), col("vy").as("y_a"), col("vz").as("z_a"),
        col("cla").as("cla0"), col("clo").as("clo0"))
      .withColumn("off", explode(array(offs: _*)))
      .select(col("id_a"), col("x_a"), col("y_a"), col("z_a"),
        (col("cla0") + col("off.dx")).as("cla"),
        (col("clo0") + col("off.dy")).as("clo"),
        (col("off.dx") === 0 && col("off.dy") === 0).as("same_cell"))
    // Conservative prefilters ahead of the exact decimal chain — both
    // SUPERSETS of the final predicate, so results are unchanged while
    // the (slow, per-row BigDecimal) stages run only on ~output-scale
    // survivors (they were 5.9 s of the sf0.1 bench on all candidates):
    //  box: each |Δcomponent| ≤ chord ≤ 2·sin(600/R)·10¹⁸ ≈ 1.8835e14
    //       (+0.35% margin for unit slop) — three long compares;
    //  circle: c2 ≤ 4·10¹⁸·a_max + slop ≈ 3.5477e28, tested in doubles
    //       (one-sided bound: the 0.35% margin dwarfs the ≤1-ulp cast
    //       and 5e-16 arithmetic error) — three multiplies.
    val boxBound = 189000000000000L
    def dbl(c: String) = col(c).cast(DoubleType)
    val pre = left.join(right, Seq("cla", "clo"))
      // same-cell pairs need the id tiebreak; forward cross-cell pairs
      // are already unique (antisymmetric offset set)
      .filter(!col("same_cell") || col("id_a") < col("id_b"))
      .withColumn("pdx", col("x_a") - col("x_b"))
      .withColumn("pdy", col("y_a") - col("y_b"))
      .withColumn("pdz", col("z_a") - col("z_b"))
      .filter(abs(col("pdx")) <= boxBound && abs(col("pdy")) <= boxBound &&
        abs(col("pdz")) <= boxBound)
      .filter(dbl("pdx") * dbl("pdx") + dbl("pdy") * dbl("pdy") +
        dbl("pdz") * dbl("pdz") <= lit(3.56e28))
    // r17: the radius filter rides a NON-DETERMINISTIC guard column
    // (monotonically_increasing_id() ≥ 0 is always true, so d2g ≡
    // d2_mm2) purely to pin the filter ABOVE the staged chord chain.
    // Without the guard PushPredicateThroughJoin folds the predicate
    // into the join condition, re-substituting the whole chain through
    // every stage alias — the condition ends up evaluating ~8 copies
    // of the c2 decimal chain per candidate (no CSE in join-condition
    // codegen), which was 0.7 s of this query at sf0.1. With it the
    // chain evaluates once per surviving row in a staged Project:
    // 1.43 → 0.60 s bench median. Results are unchanged — the guard
    // branch is constant-true and d2_mm2 itself stays deterministic.
    withStages(pre,
        chordD2Stages("x_a", "y_a", "z_a", "x_b", "y_b", "z_b", SparkFp))
      .withColumn("d2g",
        when(monotonically_increasing_id() >= 0, col("d2_mm2")))
      .filter(col("d2g") <= lit(HavRadiusMm2))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        floor(sqrt(col("d2_mm2").cast(DoubleType))).as("dist_mm"))
  }

  /** Declared query (oracle-bearing since r15 — fixed-point layer):
    * [[qGeoTrajectory]] with great-circle step MILLIMETERS instead of
    * Manhattan microdegrees — same single-wide-exchange plan (user-keyed
    * window carries the lagged point AND its staged cos, groupBy reuses
    * the partitioning). A user's first event lags to NULL, which
    * propagates through the integer stages so count/sum/max skip it,
    * exactly as the float version's null step did. */
  val qGeoTrajectoryHaversine: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = withStages(
      Tables.events(s, d).select(col("user_id"), col("ts"),
        col("event_id"),
        derivedCoord(col("event_id"), "#lat", Range).as("lat_u"),
        derivedCoord(col("event_id"), "#lon", Range).as("lon_u")),
      unitVecStages("lat_u", "lon_u", "v", SparkFp))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("vx"), col("vy"), col("vz"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val lagged = ev
      .withColumn("x_p", lag("vx", 1).over(w))
      .withColumn("y_p", lag("vy", 1).over(w))
      .withColumn("z_p", lag("vz", 1).over(w))
    withStages(lagged,
        chordD2Stages("x_p", "y_p", "z_p", "vx", "vy", "vz", SparkFp))
      .withColumn("step_mm", floor(sqrt(col("d2_mm2").cast(DoubleType))))
      .groupBy("user_id")
      .agg(count(col("step_mm")).as("n_moves"),
        coalesce(sum("step_mm"), lit(0L)).as("dist_total_mm"),
        max("step_mm").as("max_step_mm"))
  }

  /** Convex zone rings (CCW, integer microdegrees inside the derived
    * [0, 1e6) span) — the transit-zone / geofence layer: stop-to-zone
    * assignment, fare zones, service areas. Literal dims like the
    * gapfill grid; declaration order is the classification precedence. */
  private val zoneRings: Seq[(String, Seq[(Long, Long)])] = Seq(
    "central" -> Seq((200000L, 200000L), (700000L, 250000L),
      (650000L, 700000L), (250000L, 650000L)),
    "east" -> Seq((700000L, 100000L), (950000L, 150000L),
      (900000L, 500000L), (720000L, 450000L)))

  /** Point-in-convex-polygon via the winding cross-product: inside a CCW
    * ring iff every edge's cross (x2−x1)·(y−y1) − (y2−y1)·(x−x1) ≥ 0
    * (boundary counts as inside). Pure 64-bit integer arithmetic —
    * |dx|·|y−y1| < 1e6·1e6 = 1e12 — so Spark and DuckDB agree bit-exact,
    * and the k conditions fold into one codegen'd boolean, no UDF. */
  def inConvex(x: Column, y: Column, ring: Seq[(Long, Long)]): Column =
    ring.indices.map { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.size)
      (lit(x2 - x1) * (y - lit(y1)) - lit(y2 - y1) * (x - lit(x1))) >= 0
    }.reduce(_ && _)

  /** Declared query: zone classification of every derived customer
    * point — first matching ring wins, unmatched points land in 'none'.
    * Map-side only (ZERO shuffles): the zone set is a literal constant,
    * so at 100 TB this is a pure scan-rate pass; a groupBy rollup on top
    * would add exactly one exchange carrying one row per zone. */
  val qGeoZone: Q = (s, d) => {
    val zone = zoneRings.foldRight(lit("none")) { case ((name, ring), acc) =>
      when(inConvex(col("lat_u"), col("lon_u"), ring), lit(name))
        .otherwise(acc)
    }
    customerPoints(s, d).withColumn("zone", zone)
  }

  /** An L-shaped (CONCAVE) ring: the bottom strip plus the left column
    * of the coordinate patch — the shape real transit zones take, which
    * [[inConvex]] cannot express. */
  private val concaveRing: Seq[(Long, Long)] = Seq(
    (100000L, 100000L), (900000L, 100000L), (900000L, 400000L),
    (400000L, 400000L), (400000L, 900000L), (100000L, 900000L))

  /** Even–odd ray casting for ARBITRARY simple rings (concave included),
    * still pure 64-bit integers: a +y-direction-agnostic ray from
    * (x, y) toward +x crosses edge i iff the edge spans y half-open
    * ((y1 > y) ≠ (y2 > y) — the standard vertex-double-count guard) and
    * the intersection lies strictly right of the point. The division in
    * x1 + (x2−x1)(y−y1)/(y2−y1) > x is cross-multiplied away by
    * d = y2−y1 with the comparison flipped when d < 0 (d = 0 edges never
    * span), so Spark and DuckDB agree bit-exact. Inside = odd crossing
    * count. Boundary points are half-open (unlike [[inConvex]]'s
    * closed boundary) — fine for classification, where both engines
    * make the same deterministic call. */
  def inPolygon(x: Column, y: Column, ring: Seq[(Long, Long)]): Column =
    ring.indices.flatMap { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.size)
      if (y1 == y2) None // horizontal edges never span — no crossing term
      else {
        val spans = (lit(y1) > y) =!= (lit(y2) > y)
        val lhs = (x - lit(x1)) * lit(y2 - y1)
        val rhs = lit(x2 - x1) * (y - lit(y1))
        val right = if (y2 - y1 > 0) lhs < rhs else lhs > rhs
        Some(when(spans && right, 1).otherwise(0))
      }
    }.reduce(_ + _) % 2 === 1

  /** Declared query: [[qGeoZone]]'s concave sibling — membership of
    * every derived customer point in the L-shaped ring via even–odd ray
    * casting. Same zero-shuffle scan-rate shape. */
  val qGeoZoneConcave: Q = (s, d) =>
    customerPoints(s, d).withColumn("zone",
      when(inPolygon(col("lat_u"), col("lon_u"), concaveRing), lit("harbor"))
        .otherwise(lit("none")))

  /** Implausible-speed flags over the derived trajectories: a step is
    * an outlier when Manhattan distance / elapsed time exceeds 500
    * units/s — the GPS-glitch filter every mobility pipeline runs
    * before aggregating traces. Cross-multiplied entirely in longs
    * (step·10⁶ > 500·gap_µs — no division, no floats); one user-keyed
    * window pass, flags computed map-side after it. */
  val qGeoSpeed: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).select(col("user_id"), col("ts"),
      col("event_id"),
      derivedCoord(col("event_id"), "#lat", Range).as("lat_u"),
      derivedCoord(col("event_id"), "#lon", Range).as("lon_u"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.withColumn("step",
        abs(col("lat_u") - lag("lat_u", 1).over(w)) +
          abs(col("lon_u") - lag("lon_u", 1).over(w)))
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("step").isNotNull &&
        col("step") * 1000000L > lit(500L) * col("gap_us"))
      .select(col("user_id"), col("event_id"), col("step"), col("gap_us"))
  }

  /** Hotspot cell spacing (µdeg): the 1°×1° patch becomes a 10×10 grid
    * with meaningful per-cell mass at every fixture sf. */
  val HotspotCell = 100000L

  /** Grid hotspot detection (a Getis-Ord-style local concentration
    * screen kept exact): per populated cell, compare its event count
    * against its 3×3 neighborhood — `hot` iff cnt·n_nbr ≥ 2·nbr_sum,
    * i.e. the cell carries at least twice its PRESENT neighbors' mean
    * (cross-multiplied, no division; an isolated populated cell is hot
    * by convention — 0 ≥ 0 — concentration with no neighborhood at
    * all). The transit-ops "where do events pile up" screen.
    *
    * Scale shape: ONE corpus exchange builds the cell census; the 8-way
    * neighbor probe is a map-side explode OF THE CENSUS joined back to
    * itself on cell-key equality (the [[neighborPairs]] device turned
    * count-side), so every post-census stage moves |cells| rows. Packed
    * keys cannot alias: probe keys that fall off the grid edge simply
    * match nothing. */
  val qGeoHotspot: Q = (s, d) => {
    val counts = Tables.events(s, d)
      .select(derivedCoord(col("event_id"), "#lat", Range).as("lat_u"),
        derivedCoord(col("event_id"), "#lon", Range).as("lon_u"))
      .groupBy(gridCell(col("lat_u"), col("lon_u"), HotspotCell)
        .as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val k = 2L * 100000000L / HotspotCell
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 if dx != 0 || dy != 0 }
      yield lit(dx * k + dy)
    val probes = counts
      .select(col("cell").as("c0"), col("cnt").as("nbr_cnt"))
      .withColumn("off", explode(array(offs: _*)))
      .select((col("c0") + col("off")).as("cell"), col("nbr_cnt"))
    counts.join(probes, Seq("cell"), "left")
      .groupBy(col("cell"), col("cnt"))
      .agg(count(col("nbr_cnt")).as("n_nbr"),
        coalesce(sum(col("nbr_cnt")), lit(0L)).as("nbr_sum"))
      .select(col("cell"), col("cnt"), col("n_nbr"), col("nbr_sum"),
        (col("cnt") * col("n_nbr") >= col("nbr_sum") * 2).as("hot"))
  }

  /** Origin–destination matrix — the transit-planning staple: per
    * (user, day) trace, origin = the cell of the FIRST event and
    * destination = the cell of the LAST (both at [[HotspotCell]]
    * spacing, (ts, event_id)-ordered), rolled up to flow counts per
    * (origin, destination) cell pair. Same-cell rows are the
    * stay-local diagonal a planner reads off first.
    *
    * Scale shape: one (user, day)-keyed exchange carries BOTH endpoint
    * windows (ascending and descending row_number share the exchange,
    * each with its own in-partition sort), the (user, day) contraction
    * happens on that partitioning, and the final (o, d) rollup moves
    * one row per user-day. (An r17 min_by/max_by argmin rewrite — one
    * map-side-combinable aggregate, no window sorts — measured a WASH
    * at sf0.1: user-day groups barely contract there, so the struct
    * agg buffers cost what the sorts did; the window form stays.) */
  val qGeoOdMatrix: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    // r18: both endpoints read off ONE ascending (ts, event_id) window —
    // first_value for the origin, last_value over the full frame for the
    // destination — instead of two opposite-direction row_number windows
    // (the old plan paid TWO in-partition sorts on the same exchange;
    // this one pays one). first/last over the full frame are constant
    // per (user, day), so the endpoint rollup is unchanged. (The r17
    // min_by/max_by rewrite — no window at all — was a measured wash
    // and stays out.)
    val wFull = Window.partitionBy("user_id", "day")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), to_date(col("ts")).as("day"),
        col("event_id"),
        derivedCoord(col("event_id"), "#lat", Range).as("lat_u"),
        derivedCoord(col("event_id"), "#lon", Range).as("lon_u"))
      .withColumn("cell",
        gridCell(col("lat_u"), col("lon_u"), HotspotCell))
      .withColumn("o_cell_r", first(col("cell")).over(wFull))
      .withColumn("d_cell_r", last(col("cell")).over(wFull))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("o_cell_r")).as("o_cell"),
        max(col("d_cell_r")).as("d_cell"))
      .groupBy(col("o_cell"), col("d_cell"))
      .agg(count(lit(1)).as("n_trips"))
  }

  val queries: Map[String, Q] = Map(
    "q_geo_hotspot" -> qGeoHotspot,
    "q_geo_od_matrix" -> qGeoOdMatrix,
    "q_geo_speed" -> qGeoSpeed,
    "q_geo_zone" -> qGeoZone,
    "q_geo_zone_concave" -> qGeoZoneConcave,
    "q_geo_cell" -> qGeoCell,
    "q_geo_neighbors" -> qGeoNeighbors,
    "q_geo_neighbors_haversine" -> qGeoNeighborsHaversine,
    "q_geo_trajectory" -> qGeoTrajectory,
    "q_geo_trajectory_haversine" -> qGeoTrajectoryHaversine,
    "q_geo_dwell" -> qGeoDwell)

  private val coordSql =
    """SELECT c_custkey,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || '#lat'), 1, 8)
              AS BIGINT) % 1000000 AS lat_u,
         CAST('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || '#lon'), 1, 8)
              AS BIGINT) % 1000000 AS lon_u
       FROM customer"""

  /** The [[inConvex]] conditions as DuckDB SQL, generated from the SAME
    * ring literals as the Spark side — no hand transcription to drift. */
  private def zoneCondSql(ring: Seq[(Long, Long)]): String =
    ring.indices.map { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.size)
      s"(${x2 - x1}) * (lon_u - $y1) - (${y2 - y1}) * (lat_u - $x1) >= 0"
    }.mkString(" AND ")

  private val zoneCaseSql =
    zoneRings.map { case (name, ring) =>
      s"WHEN ${zoneCondSql(ring)} THEN '$name'"
    }.mkString("CASE ", " ", " ELSE 'none' END")

  /** [[inPolygon]]'s crossing sum as DuckDB SQL, generated from the SAME
    * ring literal — the d<0 comparison flip resolved at generation time. */
  private def rayCastSql(ring: Seq[(Long, Long)]): String = {
    val terms = ring.indices.flatMap { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.size)
      if (y1 == y2) None // horizontal edges never span, as in [[inPolygon]]
      else {
        val cmp = if (y2 - y1 > 0) "<" else ">"
        Some(s"""CASE WHEN ($y1 > lon_u) <> ($y2 > lon_u)
            AND (lat_u - $x1) * (${y2 - y1}) $cmp (${x2 - x1}) * (lon_u - $y1)
          THEN 1 ELSE 0 END""")
      }
    }
    s"(${terms.mkString(" + ")}) % 2 = 1"
  }

  private val eventsCoordSql =
    """SELECT user_id, ts, event_id,
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lat'), 1, 8)
              AS BIGINT) % 1000000 AS lat_u,
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lon'), 1, 8)
              AS BIGINT) % 1000000 AS lon_u
       FROM events"""

  val oracleSql: Map[String, String] = Map(
    // Same fixed-point stages as the Spark side — both sides fold the
    // one (name, expression) list from unitVecStages/chordD2Stages, so
    // the arithmetic cannot drift; grid-blocked like q_geo_neighbors so
    // the oracle survives the sf10 digest gate.
    "q_geo_neighbors_haversine" -> {
      val p = nestStages(coordSql, unitVecStages("lat_u", "lon_u", "v", DuckFp))
      val d2 = nestStages("SELECT * FROM cand",
        chordD2Stages("x_a", "y_a", "z_a", "x_b", "y_b", "z_b", DuckFp))
      s"""WITH p AS MATERIALIZED (
           SELECT c_custkey, vx, vy, vz,
             lat_u // $HavLatCellU AS cla, lon_u // $HavLonCellU AS clo
           FROM ($p)),
         off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
           (0,0),(0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy)),
         cand AS (
           SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             a.vx AS x_a, a.vy AS y_a, a.vz AS z_a,
             b.vx AS x_b, b.vy AS y_b, b.vz AS z_b
           FROM p a JOIN off ON true
                    JOIN p b ON b.cla = a.cla + off.dx
                           AND b.clo = a.clo + off.dy
                           AND a.c_custkey < b.c_custkey)
         SELECT id_a, id_b,
           CAST(floor(sqrt(CAST(d2_mm2 AS DOUBLE))) AS BIGINT) AS dist_mm
         FROM ($d2)
         WHERE d2_mm2 <= $HavRadiusMm2
         ORDER BY id_a, id_b"""
    },
    "q_geo_trajectory_haversine" -> {
      val p = nestStages(eventsCoordSql,
        unitVecStages("lat_u", "lon_u", "v", DuckFp))
      val d2 = nestStages("SELECT * FROM l",
        chordD2Stages("x_p", "y_p", "z_p", "vx", "vy", "vz", DuckFp))
      s"""WITH l AS (
           SELECT user_id, vx, vy, vz,
             lag(vx) OVER w AS x_p,
             lag(vy) OVER w AS y_p,
             lag(vz) OVER w AS z_p
           FROM ($p)
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         st AS (
           SELECT user_id,
             CAST(floor(sqrt(CAST(d2_mm2 AS DOUBLE))) AS BIGINT) AS step_mm
           FROM ($d2))
         SELECT user_id, COUNT(step_mm) AS n_moves,
           COALESCE(CAST(SUM(step_mm) AS BIGINT), 0) AS dist_total_mm,
           CAST(MAX(step_mm) AS BIGINT) AS max_step_mm
         FROM st GROUP BY user_id ORDER BY user_id"""
    },
    "q_geo_hotspot" ->
      """WITH p AS (
           SELECT
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lat'),
               1, 8) AS BIGINT) % 1000000 AS lat_u,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lon'),
               1, 8) AS BIGINT) % 1000000 AS lon_u
           FROM events),
         c AS (
           SELECT (lat_u // 100000) * 2000 + (lon_u // 100000) AS cell,
             COUNT(*) AS cnt
           FROM p GROUP BY 1),
         o AS (SELECT unnest([-2001, -2000, -1999, -1, 1,
                              1999, 2000, 2001]) AS off),
         nb AS (
           SELECT c.cell + o.off AS cell, c.cnt AS nbr_cnt FROM c, o),
         j AS (
           SELECT c.cell, c.cnt,
             COUNT(nb.nbr_cnt) AS n_nbr,
             COALESCE(SUM(nb.nbr_cnt), 0) AS nbr_sum
           FROM c LEFT JOIN nb ON nb.cell = c.cell
           GROUP BY 1, 2)
         SELECT cell, CAST(cnt AS BIGINT) AS cnt,
           CAST(n_nbr AS BIGINT) AS n_nbr,
           CAST(nbr_sum AS BIGINT) AS nbr_sum,
           cnt * n_nbr >= nbr_sum * 2 AS hot
         FROM j ORDER BY cell""",
    "q_geo_od_matrix" ->
      """WITH p AS (
           SELECT user_id, ts, CAST(ts AS DATE) AS day, event_id,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lat'),
               1, 8) AS BIGINT) % 1000000 AS lat_u,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lon'),
               1, 8) AS BIGINT) % 1000000 AS lon_u
           FROM events),
         r AS (
           SELECT user_id, day,
             (lat_u // 100000) * 2000 + (lon_u // 100000) AS cell,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id, day
               ORDER BY ts DESC, event_id DESC) AS rn_d
           FROM p),
         od AS (
           SELECT user_id, day,
             MAX(CASE WHEN rn_a = 1 THEN cell END) AS o_cell,
             MAX(CASE WHEN rn_d = 1 THEN cell END) AS d_cell
           FROM r GROUP BY 1, 2)
         SELECT o_cell, d_cell, CAST(COUNT(*) AS BIGINT) AS n_trips
         FROM od GROUP BY 1, 2 ORDER BY o_cell, d_cell""",
    "q_geo_speed" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lat'), 1, 8)
                  AS BIGINT) % 1000000 AS lat_u,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lon'), 1, 8)
                  AS BIGINT) % 1000000 AS lon_u
           FROM events),
         s AS (
           SELECT user_id, event_id,
             abs(lat_u - lag(lat_u) OVER w)
               + abs(lon_u - lag(lon_u) OVER w) AS step,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, event_id, step, gap_us
         FROM s
         WHERE step IS NOT NULL AND step * 1000000 > 500 * gap_us
         ORDER BY user_id, event_id""",
    "q_geo_zone" ->
      s"""WITH p AS ($coordSql)
         SELECT c_custkey, lat_u, lon_u, $zoneCaseSql AS zone
         FROM p""",
    "q_geo_zone_concave" ->
      s"""WITH p AS ($coordSql)
         SELECT c_custkey, lat_u, lon_u,
           CASE WHEN ${rayCastSql(concaveRing)} THEN 'harbor'
                ELSE 'none' END AS zone
         FROM p""",
    "q_geo_cell" ->
      s"""WITH p AS ($coordSql)
         SELECT c_custkey, lat_u, lon_u,
           (lat_u // 10000) * 20000 + (lon_u // 10000) AS cell
         FROM p ORDER BY c_custkey""",
    // Grid-blocked form (round 14): |Δlat| ≤ 10000 confines a
    // qualifying pair to adjacent 10000-unit cells, so an equi-join on
    // the 9 neighbor offsets enumerates a superset of the band join's
    // candidates and the final dist_sq ≤ 10⁸ filter (which implies
    // both abs bands) reproduces the output EXACTLY; each pair matches
    // exactly one offset, so no dedup is needed. The r13 all-pairs
    // IEJoin exceeded a 5400 s watchdog at sf10 (1.5M points); the
    // blocked join is the same candidate structure the Spark side uses.
    "q_geo_neighbors" ->
      s"""WITH p AS MATERIALIZED (
           SELECT c_custkey, lat_u, lon_u,
             lat_u // 10000 AS cx, lon_u // 10000 AS cy
           FROM ($coordSql)),
         off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),
           (0,0),(0,1),(1,-1),(1,0),(1,1)) AS t(dx, dy)),
         cand AS (
           SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             (a.lat_u - b.lat_u) * (a.lat_u - b.lat_u)
               + (a.lon_u - b.lon_u) * (a.lon_u - b.lon_u) AS dist_sq
           FROM p a JOIN off ON true
                    JOIN p b ON b.cx = a.cx + off.dx
                           AND b.cy = a.cy + off.dy
                           AND a.c_custkey < b.c_custkey)
         SELECT id_a, id_b, dist_sq FROM cand
         WHERE dist_sq <= 10000 * 10000
         ORDER BY id_a, id_b""",
    "q_geo_trajectory" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lat'), 1, 8)
                  AS BIGINT) % 1000000 AS lat_u,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lon'), 1, 8)
                  AS BIGINT) % 1000000 AS lon_u
           FROM events),
         s AS (
           SELECT user_id,
             abs(lat_u - lag(lat_u) OVER w)
               + abs(lon_u - lag(lon_u) OVER w) AS step
           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, COUNT(step) AS n_moves,
           COALESCE(CAST(SUM(step) AS BIGINT), 0) AS dist_total,
           MAX(step) AS max_step
         FROM s GROUP BY user_id ORDER BY user_id""",
    "q_geo_dwell" ->
      """WITH p AS (
           SELECT user_id, ts, event_id,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lat'), 1, 8)
                  AS BIGINT) % 1000000 AS lat_u,
             CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || '#lon'), 1, 8)
                  AS BIGINT) % 1000000 AS lon_u
           FROM events),
         s AS (
           SELECT user_id, ts, event_id,
             abs(lat_u - lag(lat_u) OVER w)
               + abs(lon_u - lag(lon_u) OVER w) AS step
           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         b AS (
           SELECT user_id, ts, event_id,
             CASE WHEN step IS NULL OR step > 700000 THEN 1 ELSE 0 END AS brk
           FROM s),
         g AS (
           SELECT user_id, event_id,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS seg
           FROM b)
         SELECT user_id, seg, COUNT(*) AS n_events,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id
         FROM g GROUP BY user_id, seg
         ORDER BY user_id, seg""")
}
