package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** One-shot: the declared ANN queries' recall@10 against brute force on
  * a fixture dir — the numbers NoOracleSpec pins (round 11 item 4). */
object DbgRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = emb.find(_._1 == 0L).get._2
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / math.sqrt(na * nb)
    }
    val brute = emb.filter(_._1 != 0L)
      .map { case (id, e) => (id, cosine(e, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    for ((name, fn) <- Seq(
        "lsh" -> Similarity.qSimilarityLsh,
        "ivf" -> Similarity.qSimilarityIvf,
        "pq" -> Similarity.qSimilarityPq)) {
      val got = fn(spark, sf).collect().map(_.getLong(0))
      println(f"[recall] $name%-4s recall@10=${got.count(brute).toDouble / brute.size}%4.2f n=${got.length}")
    }
    spark.stop()
  }
}
