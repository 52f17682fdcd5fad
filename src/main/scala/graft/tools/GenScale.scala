package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-local fixture scaler for the sfN rehearsal (round 11,
  * VERDICT r10 item 1): writes `copies`× key-shifted mirrors of a
  * driver-generated sf dir, preserving every schema and per-copy value
  * distribution while making all key spaces genuinely disjoint (span
  * 10⁷ per copy — far above any fixture key, divisible by the mod-50
  * benchmark-slice device so per-copy class fractions are preserved).
  * Referential integrity survives because every foreign key shifts by
  * the same span as its dimension. Embeddings get a deterministic
  * per-copy micro-perturbation so ANN scores don't tie exactly across
  * copies (ties would make cross-engine top-k order-dependent).
  *
  * Usage: runMain graft.tools.GenScale <srcSfDir> <outDir> <copies>
  */
object GenScale {
  val Span = 10000000L

  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    /** Union of key-shifted copies; `shift` maps (df, copyIndex). */
    def scaled(name: String, files: Int)(
        shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = read(name)
      val all = (0 until copies).map(c => shift(base, c))
        .reduce(_ unionAll _)
      all.coalesce(files).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[genscale] $name x$copies -> $out/$name.parquet")
    }

    // fixed-size dims: copy verbatim (the star schema keeps 5 regions /
    // 25 nations at every sf, like TPC-H)
    Seq("region", "nation").foreach { n =>
      read(n).coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[genscale] $n (fixed dim) -> $out/$n.parquet")
    }

    scaled("customer", 2)((df, c) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(c * Span)))
    scaled("supplier", 1)((df, c) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(c * Span)))
    scaled("part", 2)((df, c) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(c * Span)))
    scaled("orders", 4)((df, c) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(c * Span))
        .withColumn("o_custkey", col("o_custkey") + lit(c * Span)))
    scaled("lineitem", 16)((df, c) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(c * Span))
        .withColumn("l_partkey", col("l_partkey") + lit(c * Span))
        .withColumn("l_suppkey", col("l_suppkey") + lit(c * Span)))
    scaled("events", 4)((df, c) =>
      df.withColumn("event_id", col("event_id") + lit(c * Span))
        .withColumn("user_id", col("user_id") + lit(c * Span)))
    scaled("documents", 2)((df, c) =>
      df.withColumn("doc_id", col("doc_id") + lit(c * Span)))
    scaled("embeddings", 1)((df, c) =>
      df.withColumn("vec_id", col("vec_id") + lit(c * Span))
        .withColumn("embedding",
          // deterministic micro-jitter, zero for copy 0: ±3e-4 by
          // dimension index — far below the fixture's score spreads,
          // just enough to break exact cross-copy ties
          transform(col("embedding"), (x, i) =>
            (x + lit(c * 1e-4f) * (pmod(i, lit(7)) - lit(3))
              .cast("float")).cast("float"))))

    spark.stop()
  }
}
