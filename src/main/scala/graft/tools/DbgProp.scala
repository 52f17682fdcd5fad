package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Debug helper: per-round cost + frontier size of label propagation over
  * the curate-gated pair graph at SPARK_GRAFT_SF_DIR. */
object DbgProp {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, sf)
    docs.count()
    val pairs = t("pairs(full corpus)")(
      graft.operators.DedupQueries.ngramPairs(docs, 9, 10))
    println("  rows=" + pairs.count())
    val sym = pairs
      .select(col("doc_a").as("id"), col("doc_b").as("nbr"))
      .union(pairs.select(col("doc_b").as("id"), col("doc_a").as("nbr")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("sym persist")(sym.count())
    var labels = t("seed groupBy")(
      sym.groupBy("id")
        .agg(least(col("id"), min(col("nbr"))).as("label"))
        .localCheckpoint(true))
    var frontier = labels.filter(col("label") < col("id"))
    var changed = t("frontier0 count")(frontier.count())
    println(s"  frontier0=$changed of ${labels.count()}")
    var iter = 1
    while (changed > 0 && iter < 25) {
      val nbrMin = sym
        .join(frontier.select(col("id").as("nbr"), col("label").as("nlabel")),
          "nbr")
        .groupBy("id").agg(min("nlabel").as("nbr_label"))
      val stepped = t(s"round $iter step")(
        labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"), col("label").as("old_label"),
            least(col("label"), coalesce(col("nbr_label"), col("label")))
              .as("label"))
          .localCheckpoint(true))
      frontier = stepped.filter(col("label") < col("old_label"))
        .select("id", "label")
      changed = frontier.count()
      println(s"  round $iter changed=$changed")
      labels = stepped.select("id", "label")
      iter += 1
    }
    spark.stop()
  }
}
