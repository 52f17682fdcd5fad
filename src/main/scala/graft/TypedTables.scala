package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` views of the core tables (SURVEY.md §1.3: case-class
  * encoders where compile-time field checks help; `DataFrame` elsewhere).
  * Encoders are Catalyst ExpressionEncoders — no Kryo, no row-by-row
  * serialization cost beyond the schema projection.
  */
object TypedTables {

  case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  case class Customer(
      c_custkey: Long, c_name: String, c_nationkey: Int, c_acctbal: Double,
      c_mktsegment: String)

  case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double, props: String)

  def lineitem(spark: SparkSession, sfDir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir).as[Lineitem]
  }

  def orders(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, sfDir).as[Order]
  }

  def customer(spark: SparkSession, sfDir: String): Dataset[Customer] = {
    import spark.implicits._
    Tables.customer(spark, sfDir).as[Customer]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, sfDir).as[Event]
  }
}
