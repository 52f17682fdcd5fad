package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-timing harness: runs each named query twice and reports both
  * (first = includes scan/codegen warmup; second = steady state). */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-24s cold=${times(0)}%6.2f warm=${times(1)}%6.2f")
    }
    spark.stop()
  }
}
