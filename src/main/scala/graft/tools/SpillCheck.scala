package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Spill/memory-pressure evidence run (round 11, VERDICT r10 item 8).
  *
  * The 100 TB story claims the heavy plans (hash aggregates, sort-merge
  * joins, frontier iterations) degrade to spill instead of OOMing when
  * execution memory is scarce — this driver PROVES it once per round:
  * it runs the heaviest registry queries under a deliberately starved
  * `spark.memory.fraction` (and a small heap via SPARK_DRIVER_MEM) and
  * prints per-query wall time + memory/disk bytes spilled from the task
  * metrics. A query that completes WITH recorded spill demonstrates the
  * graceful-degradation path; an OOM here would be the scale bug.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=1500m SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.SpillCheck q_tpch_q20,q_tpch_q21,..."
  */
object SpillCheck {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(',').toSeq
      else Seq("q_tpch_q20", "q_tpch_q21", "q_tpch_q17", "q_tpch_q18",
        "q_graph_bfs", "q_graph_kcore", "q_recursive_cte", "q_text_tfidf")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val frac = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.05")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // starve execution+storage memory so the heavy operators must
      // spill; everything else (defaults, AQE) stays production-shaped
      .config("spark.memory.fraction", frac)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val mem = new AtomicLong(0L)
    val disk = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          mem.addAndGet(m.memoryBytesSpilled)
          disk.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    println(s"[spill] heap=${Runtime.getRuntime.maxMemory() / 1048576} MiB " +
      s"memory.fraction=$frac sf=$sf")
    names.foreach { name =>
      mem.set(0L); disk.set(0L)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // drain listener events so the spill numbers attribute correctly
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(500) }
      println(f"[spill] $name%-24s rows=$n%-9d time=$secs%6.2fs " +
        f"memSpill=${mem.get / 1048576.0}%8.1f MiB " +
        f"diskSpill=${disk.get / 1048576.0}%8.1f MiB")
    }
    spark.stop()
  }
}
