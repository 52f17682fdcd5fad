package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Scalar-function queries: string / regex / date / math / hash / json /
  * map / array (SURVEY.md §2.2). All built-in `functions._` — codegen'd,
  * no UDFs in these paths.
  *
  * Cross-engine notes baked into the oracles:
  *  - Spark `regexp_replace` replaces ALL matches; DuckDB's replaces the
  *    first → oracle uses `replace()` (literal, replaces all) instead.
  *  - Spark `floor`/`ceil` on double return BIGINT; DuckDB returns double →
  *    oracle casts.
  *  - Spark `length`/`hour`/`year`… return INT; DuckDB BIGINT → oracle casts.
  *  - double→int casts are avoided entirely (Spark truncates, DuckDB
  *    rounds).
  */
object FuncQueries {

  type Q = (SparkSession, String) => DataFrame

  /** trim/upper/lower/substring/concat_ws/length/replace over part names.
    * Reference basis: .strip() cell cleaning (dags/warsaw-delays.py:147-154),
    * path concat (dags/warsaw-gtfs.py:90). */
  val qStringFuncs: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("snake"))

  /** Integer-token extraction from text — the pagination-parse semantic
    * ([int(s) for s in text.split() if s.isdigit()],
    * dags/warsaw-delays.py:91). */
  val qRegexpExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        size(regexp_extract_all(col("props"), lit("\\d+"), lit(0))).as("n_ints"),
        element_at(regexp_extract_all(col("props"), lit("\\d+"), lit(0)), 1)
          .cast(IntegerType).as("first_int"))

  /** Date-part derivation + formatting — the YYYY/MM/DD[/HH] partition-path
    * scheme (dags/warsaw-gtfs.py:90; dags/warsaw-delays.py:194;
    * dags/warsaw-weather.py:21). These exact columns are what
    * `partitionBy(year, month, day, hour)` would persist at scale. */
  val qDateFuncs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"),
        hour(col("ts")).as("hr"),
        date_format(col("ts"), "yyyy/MM/dd").as("path"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day_str"))

  /** abs/floor/ceil/pmod — numeric compare semantics
    * (dags/warsaw-delays.py:92,168). */
  val qMathFuncs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        abs(col("value") - lit(100.0)).as("dist"),
        floor(col("value")).as("flr"),
        ceil(col("value")).as("cl"),
        round(col("value"), 1).as("r1"),
        pmod(col("event_id") * 3 - 1000, lit(7L)).as("pm"))

  /** Date arithmetic over o_orderdate: datediff to a fixed anchor,
    * add-interval, month arithmetic, month/quarter boundaries. */
  val qDateArith: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("2024-01-01").cast(DateType))
          .as("days_since"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
        last_day(to_date(col("o_orderdate"))).as("eom"),
        quarter(col("o_orderdate")).as("qtr"))

  /** lpad/rpad/split_part/repeat/reverse string surface. */
  val qStringPad: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("lp"),
        rpad(col("p_brand"), 12, "-").as("rp"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        reverse(col("p_name")).as("rev"),
        repeat(col("p_type"), 2).as("rep2"))

  /** Row-level SHA-256 — the chunked-file-hash primitive
    * (dags/warsaw-gtfs.py:41-47) applied per document. */
  val qHashSha2: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))

  /** JSON path extraction + typed filter over events.props — structured
    * payload landing (dags/warsaw-weather.py:34). */
  val qJsonFuncs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .filter(col("k") > 50)

  /** JSON-object → (key, val) rows via Spark 4 VARIANT: `parse_json` →
    * `LATERAL variant_explode`. The earlier `from_json(MapType)` +
    * `explode` form parsed each payload three times (Catalyst's
    * InferFiltersFromGenerate re-substitutes the parse into its
    * non-empty guard, outside codegen); the VARIANT generator parses
    * once and fuses scan→generate→project into one codegen span —
    * measured ~2.5× faster, and the binary VARIANT encoding is the
    * shape a 100 TB semi-structured column should land in. Output is
    * plain (event_id, key, val) columns, so unlike the map-typed
    * original it sits under the exact DuckDB oracle (json_keys +
    * json_extract enumerate the same object entries). */
  val qMapOps: Q = (s, d) => {
    Tables.events(s, d).createOrReplaceTempView("map_events")
    s.sql(
      """SELECT event_id, v.key, CAST(v.value AS INT) AS val
        |FROM map_events, LATERAL variant_explode(parse_json(props)) AS v""".stripMargin)
  }

  /** Map higher-order functions over the parsed props map:
    * transform_values, map_filter, map_keys/values, back to JSON. The
    * fixture maps are single-key, so JSON rendering is deterministic and
    * oracle-checkable. */
  val qMapHof: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
      .select(col("event_id"),
        to_json(transform_values(col("m"), (_, v) => v * 2)).as("doubled_json"),
        size(map_filter(col("m"), (_, v) => v > 50)).as("n_big"),
        element_at(map_keys(col("m")), 1).as("k1"),
        element_at(map_values(col("m")), 1).as("v1"))

  /** Array basics over the embedding column: size + element access. */
  val qArrayBasic: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first"))

  /** Higher-order array functions: aggregate (L1 norm fold), filter,
    * transform, exists. Oracle-bearing since r15: the fold is a FIXED
    * left-to-right sequence of IEEE double additions over exactly
    * widened float32 elements — addition is correctly rounded, so the
    * same operand sequence is bit-identical in any engine (unlike the
    * reassociation-free guarantee §7.4 denies to engine-chosen
    * aggregation orders, an in-array-order HOF fold has no ordering
    * freedom). The float32 comparisons/clips bind literals as FLOAT on
    * both sides. */
  val qArrayHof: Q = (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + abs(x.cast(DoubleType))).as("l1"),
        size(filter(col("embedding"), x => x > lit(0.1f))).as("n_big"),
        exists(col("embedding"), x => x < lit(0.0f)).as("any_neg"),
        element_at(transform(col("embedding"),
          x => least(greatest(x, lit(-0.1f)), lit(0.1f))), 1)
          .cast(DoubleType).as("first_clipped"))

  // ---- registry ---------------------------------------------------------

  /** Binary/text encodings: base64 and hex over a document prefix, with
    * a decode round-trip proof column — the content-addressing surface
    * (payload transport, digest hex, cache keys). */
  val qStringEncode: Q = (s, d) =>
    graft.Tables(s, d, "documents")
      .select(col("doc_id"),
        substring(col("text"), 1, 16).as("s1"))
      .select(col("doc_id"),
        base64(encode(col("s1"), "UTF-8")).as("b64"),
        hex(col("s1")).as("hexs"),
        (decode(unbase64(base64(encode(col("s1"), "UTF-8"))), "UTF-8")
          === col("s1")).as("roundtrip_ok"))

  /** Business-day arithmetic, closed-form: SIGNED weekday count from
    * order date to first ship date per order (negative when the
    * shipment predates the order — the synthetic fixture contains such
    * rows, and a lead-time metric should surface them, not clamp them).
    * With m = days since the Monday anchor 1969-12-29,
    * f(m) = 5·(m div 7) + min(m mod 7, 5) counts the weekdays strictly
    * before the date, so the answer is f(ship) − f(order) — pure
    * integer arithmetic, no per-day explode (a sequence() expansion
    * would be O(span) per row; this is O(1)), identical in both
    * engines. */
  val qDateBusinessDays: Q = (s, d) => {
    val ship = graft.Tables(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    graft.Tables(s, d, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .join(ship, col("o_orderkey") === col("l_orderkey"))
      .withColumn("m0",
        datediff(col("order_date"), to_date(lit("1969-12-29"))))
      .withColumn("m1",
        datediff(col("first_ship"), to_date(lit("1969-12-29"))))
      .select(col("o_orderkey"), col("order_date"), col("first_ship"),
        (expr("5 * (m1 div 7) + least(m1 % 7, 5)") -
          expr("5 * (m0 div 7) + least(m0 % 7, 5)")).cast("int")
          .as("business_days"))
  }

  val queries: Map[String, Q] = Map(
    "q_date_business_days" -> qDateBusinessDays,
    "q_string_encode" -> qStringEncode,
    "q_string_funcs" -> qStringFuncs,
    "q_regexp_extract" -> qRegexpExtract,
    "q_date_funcs" -> qDateFuncs,
    "q_date_arith" -> qDateArith,
    "q_string_pad" -> qStringPad,
    "q_math_funcs" -> qMathFuncs,
    "q_hash_sha2" -> qHashSha2,
    "q_json_funcs" -> qJsonFuncs,
    "q_map_ops" -> qMapOps,
    "q_map_hof" -> qMapHof,
    "q_array_basic" -> qArrayBasic,
    "q_array_hof" -> qArrayHof)

  val oracleSql: Map[String, String] = Map(
    "q_date_business_days" ->
      """WITH ship AS (
           SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
           FROM lineitem GROUP BY l_orderkey),
         j AS (
           SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
             first_ship,
             date_diff('day', DATE '1969-12-29',
               CAST(o_orderdate AS DATE)) AS m0,
             date_diff('day', DATE '1969-12-29', first_ship) AS m1
           FROM orders JOIN ship ON o_orderkey = l_orderkey)
         SELECT o_orderkey, order_date, first_ship,
           CAST((5 * (m1 // 7) + least(m1 % 7, 5))
              - (5 * (m0 // 7) + least(m0 % 7, 5)) AS INT)
             AS business_days
         FROM j ORDER BY o_orderkey""",
    "q_string_encode" ->
      """SELECT doc_id,
           base64(CAST(substring(text, 1, 16) AS BLOB)) AS b64,
           hex(substring(text, 1, 16)) AS hexs,
           CAST(from_base64(base64(CAST(substring(text, 1, 16) AS BLOB)))
             AS VARCHAR) = substring(text, 1, 16) AS roundtrip_ok
         FROM documents ORDER BY doc_id""",
    "q_string_funcs" ->
      """SELECT p_partkey,
           trim('  ' || p_name || '  ') AS trimmed,
           upper(p_name) AS up,
           lower(p_type) AS lo,
           substring(p_name, 1, 5) AS sub5,
           concat_ws('-', p_brand, p_type) AS brand_type,
           CAST(length(p_name) AS INT) AS name_len,
           replace(p_name, ' ', '_') AS snake
         FROM part ORDER BY p_partkey""",
    "q_regexp_extract" ->
      """SELECT event_id,
           CAST(len(regexp_extract_all(props, '\d+')) AS INT) AS n_ints,
           CAST(regexp_extract_all(props, '\d+')[1] AS INT) AS first_int
         FROM events ORDER BY event_id""",
    "q_date_funcs" ->
      """SELECT event_id,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS dom,
           CAST(hour(ts) AS INT) AS hr,
           strftime(ts, '%Y/%m/%d') AS path,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day_str
         FROM events ORDER BY event_id""",
    "q_math_funcs" ->
      """SELECT event_id,
           abs(value - 100.0) AS dist,
           CAST(floor(value) AS BIGINT) AS flr,
           CAST(ceil(value) AS BIGINT) AS cl,
           round(value, 1) AS r1,
           ((event_id * 3 - 1000) % 7 + 7) % 7 AS pm
         FROM events ORDER BY event_id""",
    "q_date_arith" ->
      """SELECT o_orderkey,
           CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
           last_day(CAST(o_orderdate AS DATE)) AS eom,
           CAST(quarter(o_orderdate) AS INT) AS qtr
         FROM orders ORDER BY o_orderkey""",
    "q_string_pad" ->
      """SELECT p_partkey,
           lpad(p_brand, 12, '*') AS lp,
           rpad(p_brand, 12, '-') AS rp,
           string_split(p_name, ' ')[1] AS first_word,
           reverse(p_name) AS rev,
           repeat(p_type, 2) AS rep2
         FROM part ORDER BY p_partkey""",
    "q_hash_sha2" ->
      """SELECT doc_id, sha256(text) AS digest
         FROM documents ORDER BY doc_id""",
    "q_json_funcs" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
         ORDER BY event_id""",
    "q_map_ops" ->
      """SELECT event_id, k AS key,
           CAST(props->>k AS INTEGER) AS val
         FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
               FROM events)
         ORDER BY event_id, key""",
    "q_map_hof" ->
      """SELECT event_id,
           '{"k":' || CAST(2 * CAST(json_extract_string(props, '$.k') AS INT)
                      AS VARCHAR) || '}' AS doubled_json,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
                THEN 1 ELSE 0 END AS n_big,
           'k' AS k1,
           CAST(json_extract_string(props, '$.k') AS INT) AS v1
         FROM events ORDER BY event_id""",
    "q_array_basic" ->
      """SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           embedding[1] AS first
         FROM embeddings ORDER BY vec_id""",
    // the l1 fold mirrors Spark's aggregate() element order exactly:
    // list_reduce over abs-widened doubles, seeded by a prepended 0.0
    "q_array_hof" ->
      """SELECT vec_id,
           list_reduce(
             list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
             (acc, x) -> acc + x) AS l1,
           CAST(len(list_filter(embedding,
             x -> x > CAST(0.1 AS FLOAT))) AS INT) AS n_big,
           len(list_filter(embedding,
             x -> x < CAST(0.0 AS FLOAT))) > 0 AS any_neg,
           CAST(least(greatest(embedding[1], CAST(-0.1 AS FLOAT)),
             CAST(0.1 AS FLOAT)) AS DOUBLE) AS first_clipped
         FROM embeddings ORDER BY vec_id""")
}
