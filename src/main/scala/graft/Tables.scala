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

  /** `ts` is timestamp[ns] on disk. Spark's TimestampType is µs and the
    * 4.1 parquet reader rejects TIMESTAMP(NANOS) outright
    * ([PARQUET_TYPE_ILLEGAL]); we read it as raw Long nanoseconds via
    * `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to µs in
    * [[events]]. DuckDB's TIMESTAMP is µs too (it truncates ns parquet on
    * read), so both engines see identical values (SURVEY.md §7.3).
    */
  val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // ns since epoch (nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val eventsSchema = StructType(eventsRawSchema.map {
    case StructField("ts", _, n, m) => StructField("ts", TimestampType, n, m)
    case f => f
  })

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
    if (name == "events") events(spark, sfDir)
    else spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.schema(eventsRawSchema).parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Time-bounded events scan that PUSHES the range predicate to parquet.
    *
    * A filter on the converted `ts` column cannot reach the scan (the
    * ns→µs expression blocks it), so at scale a naive
    * `events(...).filter(ts between …)` reads every row group. This
    * reader applies the bounds on the raw ns column — pushable, row-group
    * skippable — then converts. Bounds are µs since epoch, inclusive
    * start / exclusive end, matching the truncated-µs view of `ts`. */
  def eventsRange(spark: SparkSession, sfDir: String,
      fromUs: Long, untilUs: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.schema(eventsRawSchema).parquet(s"$sfDir/events.parquet")
      .filter(col("ts") >= fromUs * 1000L && col("ts") < untilUs * 1000L)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
