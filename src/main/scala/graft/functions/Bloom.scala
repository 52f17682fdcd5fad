package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Column-level surface over Spark's native Bloom-filter expressions —
  * `BloomFilterAggregate` / `BloomFilterMightContain`, the codegen'd
  * machinery Catalyst itself injects for runtime join filters — so
  * operators can build and probe Bloom sketches without a scalar UDF
  * (which would fence off whole-stage codegen) and without hand-rolled
  * broadcast plumbing.
  *
  * Keys are hashed with `xxhash64` on BOTH the build and probe sides;
  * the two sides must use the same hashing to be compatible (the
  * aggregate inserts raw longs).
  */
object Bloom {

  /** Optimal bit count for `n` items at false-positive rate `p`:
    * m = ⌈−n·ln p / (ln 2)²⌉. */
  def optimalNumBits(n: Long, p: Double): Long = {
    require(n > 0 && p > 0 && p < 1)
    math.ceil(-n.toDouble * math.log(p) / (math.log(2) * math.log(2))).toLong
  }

  /** Spark enforces session caps on Bloom aggregate sizing —
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (default 4M)
    * and `.maxNumBits` (default 64Mbit ≈ 8 MB) — via a bare
    * `require(...)` at analysis time, so a [[bloomAgg]] sized past them
    * fails with an opaque "requirement failed". Raise the caps to fit a
    * requested (items, fpp) before building anything bigger; no-op when
    * the current caps already suffice. */
  def ensureCapacity(spark: org.apache.spark.sql.SparkSession,
      expectedItems: Long, fpp: Double): Unit = {
    val items = expectedItems.max(1L)
    val bits = optimalNumBits(items, fpp)
    def raiseTo(key: String, v: Long): Unit =
      if (spark.conf.get(key).toLong < v) spark.conf.set(key, v)
    raiseTo("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", items)
    raiseTo("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", bits)
  }

  /** Aggregate Column producing a serialized Bloom filter over
    * `xxhash64(c)`. Distributed build: partial sketches merge
    * executor-side; only the final bitmap leaves the aggregation.
    * Sizing past the session caps fails analysis — see
    * [[ensureCapacity]]. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column = {
    val items = expectedItems.max(1L)
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(c)),
      Literal(items), Literal(optimalNumBits(items, fpp)))
      .toAggregateExpression())
  }

  /** Build a Bloom filter over one column of `df` and return its
    * serialized form, or null when `df` is empty (the aggregate's
    * no-input result). The bitmap is the ONLY thing collected —
    * `optimalNumBits` caps it at ~120 KB per million expected items at
    * 1% fpp, the same driver-side-scalar budget as any broadcast dim. */
  def build(df: DataFrame, c: Column, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    ensureCapacity(df.sparkSession, expectedItems, fpp)
    df.select(bloomAgg(c, expectedItems, fpp).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** Probe Column: may-contain test of `xxhash64(c)` against a
    * serialized filter from [[build]]/[[bloomAgg]]. Codegen'd predicate —
    * stays inside whole-stage codegen, unlike a UDF probe. NULL when the
    * probed value is NULL; callers needing three-valued safety wrap in
    * `coalesce(_, lit(false))`. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(xxhash64(c))))
}
