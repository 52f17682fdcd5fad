package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug helper: run named queries at SPARK_GRAFT_SF_DIR, print row counts
  * (and the full stack trace on failure) — the quickest way to reproduce a
  * single CORRECTNESS entry outside the full Verify dump. */
object CountQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { n =>
      try println(s"$n rows=" + graft.SparkEntry.queries(n)(spark, sf).count())
      catch { case e: Throwable =>
        println(s"$n FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
