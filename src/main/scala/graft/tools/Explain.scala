package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for representative queries
  * so scan pruning (ReadSchema/PushedFilters), join strategies, and
  * whole-stage-codegen coverage can be reviewed (SURVEY.md §4.2).
  *
  * Usage: runMain graft.tools.Explain [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_projection", "q_filter_pred", "q_join_broadcast", "q_join_inner",
      "q_agg_group", "q_topk", "q_dedup_ngram", "q_similarity_topk")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
