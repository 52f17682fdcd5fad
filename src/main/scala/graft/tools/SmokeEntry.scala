package graft.tools

/** Driver-contract smoke: SparkEntry.entry must return rows > 0 on the
  * sf0.001 fixture — run locally so the contract never breaks unnoticed. */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n")
    assert(n > 0)
    spark.stop()
  }
}
