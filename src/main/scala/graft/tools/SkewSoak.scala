package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Salting

/** Skew soak for the salting machinery (round 16, VERDICT r15 item 5):
  * the declared q_agg_salted/q_join_salted queries prove salt
  * CORRECTNESS against uniform fixtures; this tool proves the salted
  * plans' skew RESISTANCE on a deliberately skewed variant of the sf1
  * mirror — one supplier key remapped onto ~30% of lineitem — by
  * A/B-ing salted vs unsalted plans and reading per-task straggler
  * metrics (max/median duration and shuffle-read records of the
  * heaviest shuffle-read stage) off a SparkListener.
  *
  * The A/B runs with AQE OFF and broadcast joins disabled: that is the
  * regime the salting layer exists for (Salting.scala scaladoc — "for
  * the cases AQE can't see": a join under a required distribution, or
  * any engine/mode without runtime skew splitting). With default AQE
  * on, the skew-join rule splits the sort-merge straggler
  * automatically, and q_join_salted's oracle already pins that path.
  *
  * Expected shape (recorded in BASELINE.md):
  *   - join unsalted: one reduce task reads ~30% of all fact rows →
  *     records max/median ≳ 10×; salted n=8: ≤ ~2×.
  *   - agg (count) unsalted vs salted: BOTH flat — hash aggregation's
  *     map-side partial combine contracts the hot key to one row per
  *     map task before the shuffle, so a plain count never skews; the
  *     salted variant must simply not be WORSE. The record keeps this
  *     honest instead of manufacturing a fake agg win.
  *
  * Usage: runMain graft.tools.SkewSoak [sfDir] (default testdata-sf1)
  */
object SkewSoak {

  /** per-stage (durationMs, shuffleReadRecords) samples */
  final class TaskStats extends SparkListener {
    val byStage = mutable.Map[Int, mutable.ArrayBuffer[(Long, Long)]]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = synchronized {
      val m = te.taskMetrics
      if (m != null)
        byStage.getOrElseUpdate(te.stageId, mutable.ArrayBuffer()) +=
          ((te.taskInfo.duration, m.shuffleReadMetrics.recordsRead))
    }
  }

  private def med(xs: Seq[Long]): Long = {
    val s = xs.sorted
    if (s.isEmpty) 0L else s(s.size / 2)
  }

  /** Run one plan, return straggler metrics of the stage that shuffled
    * in the most records (the reduce side under test). */
  def measure(spark: SparkSession, label: String)(plan: => DataFrame)
      : Map[String, Any] = {
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    val t0 = System.nanoTime()
    plan.write.format("noop").mode("overwrite").save()
    val wallS = (System.nanoTime() - t0) / 1e9
    // the listener bus is ASYNC: task-end events for the job's final
    // tasks can still be in flight when the submission call returns
    // (ADVICE r16) — poll until the captured task count stops growing
    // (3 consecutive stable 50ms reads) before detaching the listener
    var prev = -1L
    var stable = 0
    var spins = 0
    while (stable < 3 && spins < 200) {
      val n = stats.synchronized(
        stats.byStage.valuesIterator.map(_.size.toLong).sum)
      if (n == prev) stable += 1 else { stable = 0; prev = n }
      Thread.sleep(50)
      spins += 1
    }
    spark.sparkContext.removeSparkListener(stats)
    require(stats.byStage.nonEmpty,
      s"$label: no task-end events captured — listener bus dropped " +
        "everything; straggler metrics would be meaningless")
    val (_, tasks) = stats.byStage.maxBy(_._2.map(_._2).sum)
    val durs = tasks.map(_._1).toSeq
    val recs = tasks.map(_._2).toSeq
    val out = Map(
      "case" -> label, "wall_s" -> f"$wallS%.2f".toDouble,
      "tasks" -> tasks.size,
      "dur_med_ms" -> med(durs), "dur_max_ms" -> durs.max,
      "rec_med" -> med(recs), "rec_max" -> recs.max,
      "rec_ratio" -> (if (med(recs) == 0) -1.0
        else f"${recs.max.toDouble / med(recs)}%.1f".toDouble))
    println(out.map { case (k, v) => s""""$k":${v match {
      case s: String => s""""$s""""
      case x => x.toString
    }}""" }.mkString("{", ",", "}"))
    out
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      // the no-runtime-skew-handling regime under test
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val hot = li.agg(min("l_suppkey")).collect()(0).getLong(0) // 1-row scalar
    // deterministic skew: ~30% of fact rows land on one supplier key
    val skewed = li.select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      when(pmod(col("l_orderkey"), lit(10)) < 3, lit(hot))
        .otherwise(col("l_suppkey")).as("l_suppkey"))
    val dim = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))

    val joinU = measure(spark, "join_unsalted") {
      skewed.join(dim, Seq("l_suppkey"))
    }
    val joinS = measure(spark, "join_salted_n8") {
      Salting.saltedJoin(skewed, dim, "l_suppkey", n = 8)
    }
    // n=8 sub-keys can COLLIDE in the 32-partition hash space (two hot
    // sub-keys on one reducer ≈ 2/8 of the hot key) — the scale tuning
    // is n ≳ 2× the reducer count so collisions stop mattering
    val joinS64 = measure(spark, "join_salted_n64") {
      Salting.saltedJoin(skewed, dim, "l_suppkey", n = 64)
    }
    val aggU = measure(spark, "agg_count_unsalted") {
      skewed.groupBy("l_suppkey").count()
    }
    val aggS = measure(spark, "agg_count_salted_n8") {
      Salting.saltedCount(skewed, col("l_suppkey"), n = 8)
    }

    // correctness cross-check on the skewed input: salted ≡ unsalted
    val cntU = skewed.groupBy("l_suppkey").count()
      .orderBy("l_suppkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    val cntS = Salting.saltedCount(skewed, col("l_suppkey"), 8)
      .orderBy("key").collect().map(r => (r.getLong(0), r.getLong(1)))
    require(cntU.sameElements(cntS), "salted count diverged on skewed input")
    val ju = skewed.join(dim, Seq("l_suppkey")).count()
    val js = Salting.saltedJoin(skewed, dim, "l_suppkey", 8).count()
    require(ju == js, s"salted join row count diverged: $ju vs $js")

    println(s"SUMMARY join rec_ratio unsalted=${joinU("rec_ratio")} " +
      s"salted_n8=${joinS("rec_ratio")} salted_n64=${joinS64("rec_ratio")}" +
      s" | agg rec_ratio " +
      s"unsalted=${aggU("rec_ratio")} salted=${aggS("rec_ratio")} | " +
      s"rows=$ju hot_key=$hot")
    spark.stop()
  }
}
