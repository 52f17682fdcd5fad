package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper: per-query Catalyst optimization wall time and
  * optimized-plan expression-node count — the driver-side cost a
  * heavily staged (withColumn-chained) query pays per plan build. */
object PlanSize {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { n =>
      val t0 = System.nanoTime()
      val qe = graft.SparkEntry.queries(n)(spark, sf).queryExecution
      val opt = qe.optimizedPlan
      val tOpt = (System.nanoTime() - t0) / 1e9
      val nExpr = opt.collect { case p =>
        p.expressions.map(_.collect { case e => e }.size).sum
      }.sum
      println(f"$n%-28s optimize=$tOpt%6.2fs exprNodes=$nExpr")
    }
    spark.stop()
  }
}
