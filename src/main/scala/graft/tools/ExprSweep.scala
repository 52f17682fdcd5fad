package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec,
  ShuffledHashJoinExec, SortMergeJoinExec}

/** Registry-wide expression-blowup sweep (the r17 haversine disease:
  * PushPredicateThroughJoin re-substitutes staged withColumn chains into
  * join conditions / pushed filters with NO CSE, multiplying per-row
  * cost invisibly). Walks every query's executed plan and reports any
  * Filter condition, join condition, or single Project expression whose
  * string form exceeds the threshold (default 20 KB). Intentional
  * literal tables (Bloom bitmaps, hash planes, CASE lookup tables) show
  * up here and are expected; anything ELSE is a duplicated-chain bug.
  *
  * Usage: runMain graft.tools.ExprSweep [thresholdBytes]
  */
object ExprSweep {
  def main(args: Array[String]): Unit = {
    val threshold = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    def big(e: Expression): Option[Int] = {
      val n = e.toString.length
      if (n > threshold) Some(n) else None
    }
    var hits = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan
        def sweep(p: SparkPlan): Seq[String] = p.collect {
          case f: FilterExec => big(f.condition).map(n => s"Filter $n B")
          case j: SortMergeJoinExec =>
            j.condition.flatMap(big).map(n => s"SMJ residual $n B")
          case j: ShuffledHashJoinExec =>
            j.condition.flatMap(big).map(n => s"SHJ residual $n B")
          case j: BroadcastHashJoinExec =>
            j.condition.flatMap(big).map(n => s"BHJ residual $n B")
          case pr: ProjectExec =>
            pr.projectList.flatMap(big).sorted.lastOption
              .map(n => s"Project expr $n B")
        }.flatten
        val expanded = plan.collect {
          case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.executedPlan
        }
        val found = (plan +: expanded).flatMap(sweep).distinct
        if (found.nonEmpty) { hits += 1
          println(s"$name: ${found.mkString("; ")}") }
      } catch { case e: Throwable =>
        println(s"$name: SWEEP ERROR ${e.getMessage.take(80)}") }
    }
    println(s"[exprsweep] done, $hits quer${if (hits == 1) "y" else "ies"} over $threshold B")
    spark.stop()
  }
}
