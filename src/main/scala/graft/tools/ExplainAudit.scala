package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit entry point: prints the scan/join/exchange lines of the
  * physical plan for a set of registry queries (args, or the round-6
  * additions by default) — the quick check that broadcasts stayed
  * broadcast, column pruning reached the scan, and no exchange appeared
  * unplanned. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_text_contamination", "q_dedup_lines", "q_pack_sequences",
        "q_mix_upsample", "q_agg_stats", "q_layout_zorder")
    for (n <- names) {
      println(s"===== $n")
      val p = graft.SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan.toString
      println(p.split("\n").filter(l =>
        l.contains("Scan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("ReadSchema") || l.contains("PushedFilters")).mkString("\n"))
    }
    spark.stop()
  }
}
