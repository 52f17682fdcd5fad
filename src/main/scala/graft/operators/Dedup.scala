package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** User-facing deduplication facade — one namespace for every dedup
  * strategy the engine provides, each deterministic (keep-lowest by the
  * tiebreak column, never `dropDuplicates`' arbitrary survivor).
  */
object Dedup {

  /** Exact dedup on `keys`, keeping the row with the smallest `tieBreak`. */
  def exact(df: DataFrame, keys: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Exact dedup on a sha-256 digest of `textCol` — at 100 TB the shuffle
    * key is a 32-byte digest instead of full documents. */
  def byDigest(df: DataFrame, textCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(sha2(col(textCol), 256)).orderBy(col(tieBreak))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Near-dup pairs by token-set Jaccard ≥ tNum/tDen
    * (prefix-filtered similarity join; see [[DedupQueries.ngramPairs]]). */
  def nearTokenSetPairs(docs: DataFrame, tNum: Int, tDen: Int): DataFrame =
    DedupQueries.ngramPairs(docs, tNum, tDen)

  /** Near-dup candidate pairs within a SimHash hamming radius. */
  def nearSimhashPairs(docs: DataFrame, maxHamming: Int): DataFrame =
    DedupQueries.simhashPairs(simhashOf(docs), maxHamming)

  /** 60-bit SimHash signature per (doc_id, text) row.
    *
    * The 60 per-bit contribution sums are 60 columnar aggregates over the
    * raw token occurrences (frequency weighting falls out for free: each
    * occurrence contributes ±1, so Σ_occurrences ±1 = Σ_tok cnt·±1 in
    * exact integer arithmetic — identical output to a (doc,tok)-counted
    * formulation). One hash aggregation, no 60× bit-row explosion, and
    * partial aggregation means the shuffle carries one 61-long row per
    * (mapper, doc) — not the raw tokens — which is what survives a
    * 100 TB corpus. Bit pack is a pure projection on the aggregate. */
  def simhashOf(docs: DataFrame): DataFrame = {
    val bitSums = (0 until 60).map(j =>
      sum(expr(s"(shiftright(h, $j) & 1) * 2 - 1")).as(s"sc$j"))
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("h",
        graft.functions.Md5Draws24.md5Prefix(col("tok"), 15))
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(j =>
          when(col(s"sc$j") > 0, lit(1L << j)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Embedding near-dup pairs: exact when `lsh` is false (O(n²), small
    * corpora), LSH-bucketed when true (the 100 TB path). */
  def nearEmbeddingPairs(corpus: DataFrame, idCol: String, embCol: String,
      minCosine: Double, dim: Int, lsh: Boolean = true,
      nbits: Int = 8): DataFrame =
    if (lsh) Similarity.lshNearDupPairs(corpus, idCol, embCol, minCosine,
      nbits, dim)
    else {
      val a = corpus.select(col(idCol).as("id_a"), col(embCol).as("emb_a"))
      val b = corpus.select(col(idCol).as("id_b"), col(embCol).as("emb_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("cosine", Similarity.cosine(col("emb_a"), col("emb_b")))
        .filter(col("cosine") >= minCosine)
        .select(col("id_a"), col("id_b"), col("cosine"))
    }
}
