package graft.pipeline

import org.apache.spark.sql.types._

/** Landing-zone schemas for the reference's three feeds (FIXTURES.md §
  * "Landing schemas"). All declared, never inferred (SURVEY.md §1.3).
  */
object LandingSchemas {

  /** Scraped delays table: 8 string columns as produced by the scraper
    * (dags/warsaw-delays.py:182) + the ingestion timestamp (:186). Typed
    * parsing of `delay_raw` happens in [[DelaysIngest]] — the reference
    * never parses it. */
  val delays = StructType(Seq(
    StructField("type", StringType),
    StructField("vehicle_no", StringType),
    StructField("brigade", StringType),
    StructField("route", StringType),
    StructField("trip_headsign", StringType),
    StructField("delay_raw", StringType),
    StructField("stop_name", StringType),
    StructField("outside", StringType),
    StructField("ingest_ts", TimestampType)))

  /** GTFS member tables (public GTFS spec; the reference re-uploads the
    * files verbatim, dags/warsaw-gtfs.py:88-96 — we parse them). */
  val gtfs: Map[String, StructType] = Map(
    "agency" -> StructType(Seq(
      StructField("agency_id", StringType),
      StructField("agency_name", StringType),
      StructField("agency_url", StringType),
      StructField("agency_timezone", StringType))),
    "calendar_dates" -> StructType(Seq(
      StructField("service_id", StringType),
      StructField("date", StringType),
      StructField("exception_type", IntegerType))),
    "feed_info" -> StructType(Seq(
      StructField("feed_publisher_name", StringType),
      StructField("feed_publisher_url", StringType),
      StructField("feed_lang", StringType))),
    "routes" -> StructType(Seq(
      StructField("route_id", StringType),
      StructField("agency_id", StringType),
      StructField("route_short_name", StringType),
      StructField("route_long_name", StringType),
      StructField("route_type", IntegerType))),
    "shapes" -> StructType(Seq(
      StructField("shape_id", StringType),
      StructField("shape_pt_lat", DoubleType),
      StructField("shape_pt_lon", DoubleType),
      StructField("shape_pt_sequence", IntegerType))),
    "stop_times" -> StructType(Seq(
      StructField("trip_id", StringType),
      StructField("arrival_time", StringType),
      StructField("departure_time", StringType),
      StructField("stop_id", StringType),
      StructField("stop_sequence", IntegerType))),
    "stops" -> StructType(Seq(
      StructField("stop_id", StringType),
      StructField("stop_name", StringType),
      StructField("stop_lat", DoubleType),
      StructField("stop_lon", DoubleType))),
    "trips" -> StructType(Seq(
      StructField("route_id", StringType),
      StructField("service_id", StringType),
      StructField("trip_id", StringType),
      StructField("trip_headsign", StringType))))

  /** One-row feed-state table (the `latest-feed-hash` blob,
    * dags/warsaw-gtfs.py:65,79-80). */
  val feedState = StructType(Seq(
    StructField("feed", StringType),
    StructField("sha256_hex", StringType)))

  /** Raw weather payload landing (dags/warsaw-weather.py:30-34). */
  val weather = StructType(Seq(
    StructField("fetched_hour", StringType),
    StructField("body", BinaryType)))
}

/** Schema drift across landed snapshots: feeds grow columns over time
  * (the reference re-uploads whatever the feed ships —
  * dags/warsaw-gtfs.py:88-96 — so a GTFS revision adding a column lands
  * with it). The landing zone is append-only: old snapshots are never
  * rewritten. Readers reconcile instead. */
object SchemaDrift {

  /** Union-of-schemas read: `mergeSchema` folds every footer's schema;
    * columns absent from older files read as NULL. At 100 TB, prefer
    * pinning [[withDeclared]] for hot paths — mergeSchema lists every
    * footer — and use this for exploratory/repair reads. */
  def readMerged(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Declared-schema read over drifted snapshots: the engine's standard
    * contract (never inferSchema) — extra on-disk columns are pruned,
    * missing ones come back NULL, and one footer read plans the scan. */
  def withDeclared(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, path: String): org.apache.spark.sql.DataFrame =
    spark.read.schema(schema).parquet(path)

  /** Corrupt-tolerant JSONL landing read: PERMISSIVE mode with an
    * explicit quarantine column — a malformed line survives as its raw
    * text with every schema column NULL, instead of silently vanishing
    * (DROPMALFORMED) or aborting a 100 TB job for one bad scrape line
    * (FAILFAST) — the landing-robustness contract the reference's
    * scrapers need (their pandas parse dies on the first malformed
    * payload).
    *
    * SPLITTING CAVEAT: Spark refuses a query that references ONLY the
    * internal corrupt-record column of a JSON scan (e.g.
    * `df.filter($"_corrupt_record".isNotNull).select("_corrupt_record")`
    * throws AnalysisException) — the raw frame must be cached before
    * such a split. Use [[readJsonQuarantineSplit]], which does this
    * correctly, rather than splitting this frame by hand. */
  def readJsonQuarantine(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, path: String): org.apache.spark.sql.DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** [[readJsonQuarantine]] pre-split into (clean, quarantine, raw):
    * clean = schema rows that parsed, quarantine = the raw text of every
    * malformed line. The parsed frame is cached HERE because Spark
    * disallows quarantine-side queries that reference only the internal
    * corrupt-record column on an uncached JSON scan (see caveat above) —
    * and both halves read it anyway. Spark's `unpersist` is plan-keyed,
    * so unpersisting a FILTERED half would not release the cached
    * parent — that's why the raw frame itself is returned: call
    * `raw.unpersist()` once both sinks are written. */
  def readJsonQuarantineSplit(spark: org.apache.spark.sql.SparkSession,
      schema: StructType, path: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions.col
    val raw = readJsonQuarantine(spark, schema, path).cache()
    (raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
      raw.filter(col("_corrupt_record").isNotNull).select("_corrupt_record"),
      raw)
  }
}

/** Ingest-integrity manifest, written next to a landed table: row count
  * plus ORDER-INDEPENDENT content digests (commutative/associative
  * folds of a 60-bit prefix of each row's sha-256 over its canonical
  * serialization — any partitioning or row order produces the same
  * values, and each fold is a one-pass map-side-combinable aggregate at
  * any scale). Downstream jobs verify a landing before trusting it: a
  * partial write, dropped partition, or silent row edit changes a
  * digest where file counts and sizes can miss it.
  *
  * TWO folds, because each has a blind spot the other covers: the XOR
  * fold cancels EVEN multiplicities (swapping two identical copies of
  * row X for two of row Y preserves count and XOR), so on tables that
  * permit duplicate rows it is not a general edit detector; the SUM
  * fold (row digest split into 30-bit halves, each summed — exact in a
  * BIGINT for any table under 2³¹ rows, no ANSI overflow) is
  * multiplicity-sensitive, catching exactly that class. Together a
  * forgery must preserve count, XOR, and both half-sums. */
object Manifest {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._

  /** 60-bit per-row digest over the CANONICAL serialization: each column
    * rendered LENGTH-PREFIXED (`<len>:<string-cast>`, NULL → the bare
    * token `n`, which no length-prefixed value can equal), columns
    * joined by `|`, sha-256, leading 15 hex digits. The length prefix
    * makes the serialization a prefix code — INJECTIVE for any cell
    * content: a plain separator-joined form collides e.g. ("a|b", "c")
    * with ("a", "b|c"), and a NULL with a cell holding the sentinel
    * literal — exactly the "silent row edit" class the manifest exists
    * to catch. Engine-independent for string and
    * integer columns (q_ingest_manifest pins the cross-engine equality
    * under the DuckDB oracle gate); timestamp/double columns verify
    * Spark-to-Spark but their string casts are engine-specific. */
  def rowDigest(df: DataFrame): Column =
    conv(substring(sha2(concat_ws("|",
      df.columns.map { c =>
        val str = col(c).cast("string")
        coalesce(concat(length(str).cast("string"), lit(":"), str), lit("n"))
      }: _*), 256),
      1, 15), 16, 10).cast("long")

  /** Full manifest content: (rows, xor, sum of high 30 bits, sum of low
    * 30 bits). One aggregation pass computes all four folds. */
  def digestOf(df: DataFrame): (Long, Long, Long, Long) = {
    val r = df.select(rowDigest(df).as("p"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(p)").as("x"),
        sum(expr("shiftright(p, 30)")).as("sh"),
        sum(expr("p & 1073741823")).as("sl"))
      .head()
    def l(i: Int): Long = if (r.isNullAt(i)) 0L else r.getLong(i)
    (r.getLong(0), l(1), l(2), l(3))
  }

  def write(df: DataFrame, manifestPath: String): Unit = {
    val (n, x, sh, sl) = digestOf(df)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(manifestPath),
      s"""{"rows":$n,"xor":$x,"sum_hi":$sh,"sum_lo":$sl}""")
    ()
  }

  /** Recompute from `df` and compare with the stored manifest. Sum
    * fields are optional on read (pre-sum manifests verify on
    * rows + xor alone). */
  def verify(df: DataFrame, manifestPath: String): Boolean = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(manifestPath)), "UTF-8")
    def field(k: String): Option[Long] =
      (s""""$k":(-?\\d+)""").r.findFirstMatchIn(txt).map(_.group(1).toLong)
    (field("rows"), field("xor")) match {
      case (Some(n), Some(x)) =>
        val (gn, gx, gsh, gsl) = digestOf(df)
        gn == n && gx == x &&
          field("sum_hi").forall(_ == gsh) && field("sum_lo").forall(_ == gsl)
      case _ => false
    }
  }
}
