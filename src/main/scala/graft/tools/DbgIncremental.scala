package graft.tools

import org.apache.spark.sql.functions._
import graft.operators.{DedupQueries, IncrementalDedup}

/** Phase-level timing for the incremental-dedup cold path: artifact
  * builds vs the query proper, so regressions attribute to the right
  * stage instead of the first query that happens to pay them. */
object DbgIncremental {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = graft.Tables.documents(spark, sf)
    time("warmup count")(docs.count())
    time("band artifact")(
      DedupQueries.minhashBands(docs, 2, 6, Some(s"docs:$sf:all")).count())
    time("digest artifact")(
      IncrementalDedup.docDigests(docs, Some(s"docs:$sf:digests")).count())
    time("query after artifacts")(
      IncrementalDedup.queries("q_dedup_incremental")(spark, sf).count())
    time("bloom query after artifacts")(
      IncrementalDedup.queries("q_dedup_incremental_bloom")(spark, sf).count())
    time("query warm 2")(
      IncrementalDedup.queries("q_dedup_incremental")(spark, sf).count())
    spark.stop()
  }
}
