package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.operators.Similarity

/** ANN tuning report: recall@10 and corpus scan fraction for the LSH and
  * IVF paths across their knobs, against the exact brute-force top-10.
  * The table you read before picking nbits/nprobe for a corpus size —
  * recall rises with probes exactly as scan fraction does; the knob
  * setting is a cost decision, not a guess. */
object RecallReport {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val corpus = Tables.embeddings(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < 5)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](r.fieldIndex("embedding")).toArray)

    def recallOf(got: Seq[Long], exact: Seq[Long]): Double =
      got.count(exact.toSet).toDouble / exact.size

    for ((qid, q) <- queries) {
      val exact = Similarity
        .bruteForceTopK(corpus.filter(col("vec_id") =!= qid), "vec_id",
          "embedding", q, 10)
        .collect().map(_.getLong(0)).toSeq
      for (nbits <- Seq(4, 6, 8); radius <- Seq(1, 2)) {
        val cand = Similarity.lshCandidates(
          corpus.filter(col("vec_id") =!= qid), "embedding", q, nbits, radius)
        val scanned = cand.count().toDouble / n
        val got = Similarity.lshTopK(corpus.filter(col("vec_id") =!= qid),
          "vec_id", "embedding", q, 10, nbits, radius)
          .collect().map(_.getLong(0)).toSeq
        println(f"q=$qid lsh  nbits=$nbits%-2d r=$radius scan=${scanned * 100}%5.1f%% recall@10=${recallOf(got, exact)}%4.2f")
      }
      for (nprobe <- Seq(1, 2, 3, 5)) {
        val got = Similarity.ivfTopK(corpus.filter(col("vec_id") =!= qid),
          "vec_id", "embedding", q, 10, nlist = 8, nprobe = nprobe)
          .collect().map(_.getLong(0)).toSeq
        println(f"q=$qid ivf  nprobe=$nprobe   scan=${nprobe * 100.0 / 8}%5.1f%% recall@10=${recallOf(got, exact)}%4.2f")
      }
      for (rerank <- Seq(20, 50, 100)) {
        val got = Similarity.pqTopK(corpus.filter(col("vec_id") =!= qid),
          "vec_id", "embedding", q, 10, m = 8, ksub = 16, rerank = rerank,
          cacheKey = Some(s"recall-pq:$sf:$qid"))
          .collect().map(_.getLong(0)).toSeq
        println(f"q=$qid pq   rerank=$rerank%-3d  exact=${rerank * 100.0 / n}%5.1f%% recall@10=${recallOf(got, exact)}%4.2f")
      }
    }
    spark.stop()
  }
}
