package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-timing harness: runs each named query SPARK_GRAFT_REPS times
  * (default 2) at SPARK_GRAFT_CPUS (default 4) and reports every rep
  * (first = includes scan/codegen/artifact warmup; later = steady
  * state), so driver-bench configs are reproducible locally. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt.max(1)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s " + times.map(t => f"$t%6.2f").mkString(" "))
    }
    spark.stop()
  }
}
