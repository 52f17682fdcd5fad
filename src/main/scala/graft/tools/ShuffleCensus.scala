package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

/** Census of exchanges per registered query (planned, pre-AQE): shuffle
  * count is the scale-cost proxy — review the top entries each round. */
object ShuffleCensus {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // AQE defers exchange insertion to stage materialization — plan
    // without it so the census sees the EnsureRequirements exchanges
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val rows = graft.SparkEntry.queries.toSeq.map { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan
      val sh = plan.collect { case e: ShuffleExchangeExec => e }.size
      val bc = plan.collect { case e: BroadcastExchangeExec => e }.size
      (name, sh, bc)
    }
    rows.sortBy(-_._2).foreach { case (n, s, b) =>
      println(f"$s%2d shuffles  $b%2d broadcasts  $n")
    }
    spark.stop()
  }
}
