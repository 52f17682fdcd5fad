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
    * Pre-partitioned by doc_id: HashPartitioning(doc_id) satisfies the
    * clustering requirement of every downstream groupBy whose keys
    * include doc_id, so the (doc,tok) → (doc,bit) → (doc) aggregation
    * chain — whose intermediates are 60× the input — runs with ONE
    * shuffle of the raw tokens instead of three of the exploded bits. */
  def simhashOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10)
        .cast("long"))
      .withColumn("j", explode(sequence(lit(0), lit(59))))
      .withColumn("contrib", col("cnt") * (expr("shiftright(h, j) & 1") * 2 - 1))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("contrib")).as("sc"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("sc") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(0L)).as("simhash"))

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
