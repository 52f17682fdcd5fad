package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Debug helper: stage-by-stage timing of the curate pipeline at
  * SPARK_GRAFT_SF_DIR — isolates gate / exact-dedup / pairs / labels /
  * final-annotate cost. */
object DbgCurate {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sf)
    t("warmup")(docs.count())
    val stopwords = Seq("the", "a", "of", "and", "in", "to")
    val toks = split(lower(col("text")), " ")
    val scored = docs.select(col("doc_id"), col("text"),
        size(toks).as("n_tokens"),
        size(filter(toks, x => x.isInCollection(stopwords))).as("n_stop"))
      .filter(col("n_tokens") >= 15
        && col("n_stop") * 100 <= col("n_tokens") * 40)
    t("gate")(scored.count())
    val exact = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("text").orderBy("doc_id")))
      .filter(col("rn") === 1).drop("rn")
    t("exact-dedup")(exact.count())
    val pairs = t("pairs")(
      graft.operators.DedupQueries.ngramPairs(exact, 9, 10))
    println("  pairs rows=" + pairs.count())
    val labels = t("labels")(
      graft.operators.Clustering.componentLabels(pairs))
    println("  label rows=" + labels.count())
    val out = exact
      .join(labels.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .filter(col("label").isNull || col("label") === col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("n_stop"),
        sha2(col("text"), 256).as("digest"),
        aggregate(transform(split(col("text"), ""), c => ascii(c).cast(LongType)),
          lit(0L), (h, c) => pmod(h * 31 + c, lit(1000000007L))).as("fp"))
    t("annotate+join")(out.count())
    spark.stop()
  }
}
