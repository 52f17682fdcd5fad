package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Central fixture-table loaders with explicit schemas (see FIXTURES.md).
  *
  * Schemas are declared, never inferred: on a 100 TB lake, schema inference
  * is an extra full scan and a correctness hazard (type drift between
  * files). Parquet is self-describing, so the declared schema here acts as
  * an assertion + projection contract; Catalyst prunes unreferenced columns
  * down to the scan (verify with `df.explain` → `ReadSchema`).
  *
  * The reference system (jakublaba/mobility-etl) declares its only schema as
  * a pandas column list at write time (dags/warsaw-delays.py:182,186); all
  * other tables are schema-on-read (dags/warsaw-gtfs.py:88-96). We make
  * every schema explicit instead.
  */
object Tables {

  val regionSchema = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplierSchema = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val partSchema = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val ordersSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val lineitemSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** `ts` is timestamp[µs] on disk since the round-8 fixture refresh —
    * Spark's native TimestampType unit and DuckDB's TIMESTAMP unit, so
    * both engines read identical values with no conversion. (Earlier
    * fixtures carried TIMESTAMP(NANOS), which Spark 4.1 cannot read
    * natively and we bridged via `nanosAsLong` + a µs floor-divide;
    * that shim is gone — a declared-µs read also keeps ts predicates
    * pushable, see [[eventsRange]].)
    */
  val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documentsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddingsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> regionSchema,
    "nation" -> nationSchema,
    "customer" -> customerSchema,
    "supplier" -> supplierSchema,
    "part" -> partSchema,
    "orders" -> ordersSchema,
    "lineitem" -> lineitemSchema,
    "events" -> eventsSchema,
    "documents" -> documentsSchema,
    "embeddings" -> embeddingsSchema)

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    apply(spark, sfDir, "events")

  /** Time-bounded events scan that PUSHES the range predicate to parquet.
    *
    * The bounds are literal timestamps (constant-folded from µs since
    * epoch, inclusive start / exclusive end), so the comparison reaches
    * the scan as `PushedFilters` and skips whole row groups by their
    * min/max stats — the difference between reading a day and reading
    * 100 TB. */
  def eventsRange(spark: SparkSession, sfDir: String,
      fromUs: Long, untilUs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    events(spark, sfDir)
      .filter(col("ts") >= timestamp_micros(lit(fromUs)) &&
        col("ts") < timestamp_micros(lit(untilUs)))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
