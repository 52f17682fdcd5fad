package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Symmetric per-vector int8 quantization of embedding columns — the
  * memory-scale path for ANN at 100 TB: float32 → int8 is a 4× reduction
  * in shuffle and cache footprint for candidate generation, with exact
  * re-rank on the float originals (`Similarity`). Entirely built-in HOFs
  * (`transform`/`aggregate`/`array_max`) — whole-stage codegen'd, no UDF.
  *
  * Determinism contract (§7.4): all arithmetic is double-precision IEEE
  * with the same operation order as the DuckDB oracle, and the final
  * `floor(x/scale*127 + 0.5)` is a half-up round via exact `floor` —
  * engine-native `round()` half-up/half-even disagreement never enters.
  */
object Quantize {

  /** max|x_i| of the vector in double precision. */
  def vecScale(embedding: Column): Column =
    greatest(array_max(transform(embedding, v => abs(v.cast("double")))),
      lit(1e-30))

  /** int8 code vector: floor(x/scale * 127 + 0.5). */
  def quantize(embedding: Column, scale: Column): Column =
    transform(embedding, v =>
      floor(v.cast("double") / scale * lit(127.0) + lit(0.5)).cast("int"))

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: quantize every fixture embedding; emit the code
    * vector as CSV (the driver's comparator can't hash array cells), its
    * exact integer L1 mass, and dims. */
  val qQuantizeEmbed: Q = (s, d) => {
    val withScale = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("scale", vecScale(col("embedding")))
    withScale
      .withColumn("q", quantize(col("embedding"), col("scale")))
      .select(col("vec_id"),
        array_join(transform(col("q"), _.cast("string")), ",").as("q_csv"),
        aggregate(col("q"), lit(0), (a, v) => a + abs(v)).as("q_l1"),
        size(col("q")).as("n_dims"))
  }

  val queries: Map[String, Q] = Map("q_quantize_embed" -> qQuantizeEmbed)

  val oracleSql: Map[String, String] = Map(
    "q_quantize_embed" ->
      """WITH s AS (
           SELECT vec_id, embedding,
                  greatest(list_max(list_transform(embedding,
                    u -> abs(CAST(u AS DOUBLE)))), 1e-30) AS scale
           FROM embeddings),
         q AS (
           SELECT vec_id,
                  list_transform(embedding, v ->
                    CAST(floor(CAST(v AS DOUBLE) / scale * 127.0 + 0.5)
                         AS INT)) AS qv
           FROM s)
         SELECT vec_id,
                array_to_string(qv, ',') AS q_csv,
                CAST(list_sum(list_transform(qv, v -> abs(v))) AS INT)
                  AS q_l1,
                CAST(len(qv) AS INT) AS n_dims
         FROM q ORDER BY vec_id""")
}
