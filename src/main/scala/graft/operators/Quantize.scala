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

  /** Per-label embedding centroids in EXACT milli-quantized integer
    * arithmetic: each float component is half-up-quantized to integer
    * milli-units (`floor(v·1000 + 0.5)` — same float-free-of-`round`
    * trick as [[quantize]]), then summed per (label, dimension). Integer
    * sums are associative — partition-order-independent, unlike float
    * sums — so the centroid is bit-identical at any parallelism and
    * DuckDB-oracle-checkable, where a float centroid would be neither.
    *
    * This is the k-means/IVF "update step" shape at 100 TB: `posexplode`
    * multiplies rows ×dim map-side, but partial aggregation folds them
    * before the single (label, dim)-keyed shuffle, so what moves is one
    * partial per (label, dim, input-partition) — the output is
    * |labels|·dim rows regardless of corpus size. The final mean is one
    * IEEE divide of exact integers (deterministic, §7.4). */
  def labelCentroids(vecs: DataFrame, labelCol: String = "label",
      vecCol: String = "embedding"): DataFrame = {
    vecs
      .select(col(labelCol).as("label"),
        posexplode(transform(col(vecCol), v =>
          floor(v.cast("double") * lit(1000.0) + lit(0.5)).cast("long")))
          .as(Seq("dim", "milli")))
      .groupBy("label", "dim")
      .agg(sum(col("milli")).as("sum_milli"), count(lit(1)).as("n"))
      .withColumn("mean_milli",
        col("sum_milli").cast("double") / col("n").cast("double"))
  }

  val qEmbedCentroid: Q = (s, d) => labelCentroids(Tables.embeddings(s, d))

  /** One Lloyd (k-means) assignment step, integer-exact: the first 8
    * vectors seed the centroids; every other vector goes to the nearest
    * seed by the milli-quantized squared distance
    * `‖a‖² + ‖c‖² − 2·a·c` (all int64 — no float distance ever), ties
    * to the lowest centroid id. Output is the per-centroid census the
    * update step consumes: member count, inertia (Σ dist), id range.
    *
    * Plan shape: 8 seeds broadcast into the fan-out (nested-loop by
    * design, allowlisted), the argmin is `min(struct(dist, cid))` — a
    * map-side-combinable aggregate, not a window — then an 8-row
    * rollup. At 100 TB this is one corpus scan + one keyed exchange on
    * vec_id; k centroids stay a broadcast for any k that fits memory
    * (IVF in [[Similarity]] is the path past that). */
  /** Shared assignment subplan for BOTH Lloyd halves: every non-seed
    * vector with its argmin centroid, distance, and code vector. One
    * definition so the assignment algebra (seed count, tie-break,
    * quantization) can never diverge between the census and the update
    * step — the same single-source rule as
    * [[graft.functions.VectorFunctions.milliQuant]]. */
  private def assignedVectors(s: SparkSession, d: String): DataFrame = {
    import graft.functions.VectorFunctions.dotL
    val quant = graft.functions.VectorFunctions.milliQuant(col("embedding"))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), quant.as("qv"))
      .withColumn("n2", dotL(col("qv"), col("qv")))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("qv").as("c_qv"),
        col("n2").as("c_n2"))
    e.filter(col("vec_id") >= 8)
      .crossJoin(broadcast(seeds))
      .withColumn("dist",
        col("n2") + col("c_n2") - lit(2L) * dotL(col("qv"), col("c_qv")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cid"))).as("b"),
        first(col("qv")).as("qv"))
      .select(col("vec_id"), col("b.cid").as("cid"),
        col("b.dist").as("dist"), col("qv"))
  }

  val qClusterAssign: Q = (s, d) =>
    assignedVectors(s, d)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_assigned"),
        sum(col("dist")).as("inertia"),
        min(col("vec_id")).as("first_vec"),
        max(col("vec_id")).as("last_vec"))

  /** The Lloyd UPDATE step completing [[qClusterAssign]]'s iteration:
    * per (centroid, dimension), the exact milli-sum and member count the
    * next-round centroid mean derives from (mean = sum div n, left to
    * the consumer so the artifact stays integer). posexplode keeps the
    * dimension index engine-side; the rollup is map-side combinable on
    * (cid, dim) — at 100 TB this is the one extra keyed exchange after
    * the assignment's vec_id aggregation, and the 8×64-row result is
    * the broadcast input of the next iteration. */
  val qClusterUpdate: Q = (s, d) =>
    assignedVectors(s, d)
      .select(col("cid"), posexplode(col("qv")).as(Seq("dim", "milli")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("milli")).as("sum_milli"), count(lit(1)).as("n"))

  val queries: Map[String, Q] = Map(
    "q_quantize_embed" -> qQuantizeEmbed,
    "q_embed_centroid" -> qEmbedCentroid,
    "q_cluster_assign" -> qClusterAssign,
    "q_cluster_update" -> qClusterUpdate)

  val oracleSql: Map[String, String] = Map(
    "q_cluster_assign" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS qv
           FROM embeddings),
         n AS (
           SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
           FROM e),
         seeds AS (SELECT vec_id AS cid, qv AS c_qv, n2 AS c_n2
                   FROM n WHERE vec_id < 8),
         fan AS (
           SELECT n.vec_id, s.cid,
             n.n2 + s.c_n2
               - 2 * CAST(list_sum(list_transform(list_zip(n.qv, s.c_qv),
                     t -> t[1] * t[2])) AS BIGINT) AS dist
           FROM n, seeds s WHERE n.vec_id >= 8),
         best AS (
           SELECT vec_id, cid, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist, cid) AS rn
           FROM fan)
         SELECT cid, COUNT(*) AS n_assigned,
           CAST(SUM(dist) AS BIGINT) AS inertia,
           MIN(vec_id) AS first_vec, MAX(vec_id) AS last_vec
         FROM best WHERE rn = 1 GROUP BY cid""",
    "q_cluster_update" ->
      """WITH e AS (
           SELECT vec_id,
             list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))
               AS qv
           FROM embeddings),
         n AS (
           SELECT vec_id, qv,
             CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
           FROM e),
         seeds AS (SELECT vec_id AS cid, qv AS c_qv, n2 AS c_n2
                   FROM n WHERE vec_id < 8),
         fan AS (
           SELECT n.vec_id, s.cid,
             n.n2 + s.c_n2
               - 2 * CAST(list_sum(list_transform(list_zip(n.qv, s.c_qv),
                     t -> t[1] * t[2])) AS BIGINT) AS dist
           FROM n, seeds s WHERE n.vec_id >= 8),
         best AS (
           SELECT vec_id, cid, dist,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY dist, cid) AS rn
           FROM fan),
         m AS (
           SELECT b.cid, n.qv FROM best b JOIN n USING (vec_id)
           WHERE b.rn = 1),
         x AS (
           SELECT cid,
             CAST(unnest(generate_series(0, len(qv) - 1)) AS INT) AS dim,
             unnest(qv) AS milli
           FROM m)
         SELECT cid, dim, CAST(SUM(milli) AS BIGINT) AS sum_milli,
           COUNT(*) AS n
         FROM x GROUP BY cid, dim""",
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
         FROM q ORDER BY vec_id""",
    "q_embed_centroid" ->
      """WITH q AS (
           SELECT label,
             unnest(list_transform(range(len(embedding)), i ->
               {'dim': CAST(i AS INT),
                'milli': CAST(floor(CAST(embedding[i + 1] AS DOUBLE)
                  * 1000.0 + 0.5) AS BIGINT)})) AS u
           FROM embeddings)
         SELECT label, u.dim AS dim,
           CAST(SUM(u.milli) AS BIGINT) AS sum_milli,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(u.milli) AS DOUBLE) / COUNT(*) AS mean_milli
         FROM q GROUP BY label, u.dim ORDER BY label, dim""")
}
