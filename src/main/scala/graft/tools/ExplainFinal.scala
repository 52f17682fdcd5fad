package graft.tools

/** Post-execution plan audit: runs each named query once (noop-style
  * count action) and prints the FINAL adaptive plan — the one AQE
  * actually executed, with ReusedExchange/AQEShuffleRead nodes and any
  * runtime join-strategy changes that the static `Explain` view (
  * `isFinalPlan=false`) cannot show. Uses the production session
  * factory so runtime decisions match the bench.
  *
  * Usage: runMain graft.tools.ExplainFinal <query> [query...]
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as usual).
  */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      println(s"\n========== $n ==========")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.count()
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
