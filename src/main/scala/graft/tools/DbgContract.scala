package graft.tools

import org.apache.spark.sql.functions._

/** Debug helper: sizes + per-stage cost of the identical-set contraction
  * clustering path at SPARK_GRAFT_SF_DIR. */
object DbgContract {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sf)
    t("scan warm")(docs.select(sum(length(col("text")))).collect())
    val keyed = t("keyed ckpt")(
      graft.operators.DedupQueries.docTokens(docs).filter(col("n") > 0)
        .withColumn("skey", array_join(sort_array(col("toks")), " "))
        .select("doc_id", "skey")
        .localCheckpoint(true))
    val groups = keyed.groupBy("skey")
      .agg(min("doc_id").as("rep"), count(lit(1)).as("gsize"))
    println("  groups=" + t("groups count")(groups.count()))
    val repDocs = docs.join(groups.select(col("rep").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val repPairs = t("repPairs build")(
      graft.operators.DedupQueries.ngramPairs(repDocs, 9, 10))
    println("  repPairs=" + repPairs.count())
    val labels = t("labels loop")(
      graft.operators.Clustering.componentLabels(repPairs))
    println("  rep labels=" + labels.count())
    spark.stop()
  }
}
