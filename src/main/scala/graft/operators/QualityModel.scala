package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.Tables

/** Learned quality scoring — the model tier the heuristic curation stack
  * feeds (the standard production ladder: hand-written gates label a
  * seed set, a cheap linear model generalizes them, the model scores the
  * full corpus; C4/CCNet-style pipelines and Rae et al. 2021 §A2 both
  * describe exactly this quality-classifier stage).
  *
  * Train/score split mirrors the engine's other learned artifacts (IVF
  * centroids, PQ codebooks — graft.operators.Similarity): TRAINING is a
  * bounded once-per-corpus ingest step (MLlib logistic regression over
  * 256 hashed-token presence features, labels = the deterministic
  * [[TextQueries.gopherGate]] keep flag; a 257-double artifact comes
  * back to the driver). SCORING is pure map-side Spark SQL: the weight
  * vector is inlined as a 256-element array literal and each document's
  * score is one `aggregate` HOF over its distinct hashed buckets —
  * codegen'd, zero shuffle, zero MLlib on the scoring path, linear at
  * any corpus size. At 100 TB you train on a fixture-sized sample and
  * score a petabyte without the model leaving the plan.
  *
  * Declared as the no-oracle float class (§7.4: sigmoid + double dot —
  * fold order is fixed by the array order so the query is
  * deterministic, but cross-engine float parity is not claimed);
  * QualitySpec property-pins agreement with the gate it was trained on
  * plus rerun determinism.
  */
object QualityModel {

  val NumBuckets = 256

  /** Same bucket hash as [[TextQueries.hashFeatures]] — the features a
    * downstream consumer already materializes. */
  private def bucketOf(tok: Column): Column =
    (conv(substring(md5(tok), 1, 4), 16, 10).cast("long") % NumBuckets)
      .cast(IntegerType)

  /** Distinct presence buckets per document, sorted (fixed fold order). */
  private def docBuckets(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_sort(array_distinct(transform(
        split(lower(col("text")), " "), t => bucketOf(t)))).as("buckets"))

  /** One-time trained artifact: 256 coefficients + intercept. */
  final case class Weights(coef: Array[Double], intercept: Double)

  private val cache =
    scala.collection.concurrent.TrieMap[String, Weights]()

  /** For tests / long-lived sessions (see the session-cache contract in
    * graft.operators.DedupQueries.clearArtifacts). */
  def clearCache(): Unit = cache.clear()

  /** Train the logistic gate-mimic once per corpus key. Deterministic
    * given the corpus: L-BFGS over a fixed feature space with fixed
    * hyperparameters; the result is memoized so every later scoring call
    * (and Verify's repeated runs) reuses the identical artifact. */
  def trainedWeights(spark: SparkSession, sfDir: String): Weights =
    Artifacts.memo(cache, sfDir) {
      val docs = Tables.documents(spark, sfDir)
      val labeled = TextQueries.gopherGate(docs)
        .select(col("doc_id"), col("keep").cast(DoubleType).as("label"))
      val feats = docBuckets(docs).join(labeled, "doc_id")
      import spark.implicits._
      val train = feats.select("label", "buckets").map { r =>
        val idx = r.getSeq[Int](1).toArray
        (r.getDouble(0),
          Vectors.sparse(NumBuckets, idx, Array.fill(idx.length)(1.0)))
      }.toDF("label", "features")
      val model = new LogisticRegression()
        .setMaxIter(25).setRegParam(0.01).setStandardization(false)
        .fit(train)
      Weights(model.coefficients.toArray, model.intercept)
    }

  type Q = (SparkSession, String) => DataFrame

  /** Declared query: per-doc learned quality probability, its thresholded
    * prediction, and the heuristic gate label it approximates. */
  val qQualityLogistic: Q = (s, d) => {
    val w = trainedWeights(s, d)
    val wLit = array(w.coef.map(x => lit(x)): _*)
    val z = aggregate(col("buckets"), lit(w.intercept),
      (acc, j) => acc + element_at(wLit, j + 1))
    val gate = TextQueries.gopherGate(Tables.documents(s, d))
      .select(col("doc_id"), col("keep"))
    docBuckets(Tables.documents(s, d))
      .withColumn("score", lit(1.0) / (lit(1.0) + exp(-z)))
      .select(col("doc_id"), col("score"), (col("score") >= 0.5).as("pred"))
      .join(gate, "doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_quality_logistic" -> qQualityLogistic)

  /** No-oracle float class (sigmoid); QualitySpec pins accuracy vs the
    * gate and rerun determinism. */
  val oracleSql: Map[String, String] = Map.empty
}
