package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression guard: no registered query may plan a
  * cartesian / nested-loop join except the ones that are cartesian BY
  * DESIGN (tiny-dim cross join; brute-force all-pairs baselines whose
  * scalable twins exist alongside). A new query accidentally joining
  * without a key fails here instead of at 100 TB. */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val intentionallyUnkeyed = Set(
    "q_join_cross",        // 5×25 dims — the declared CROSS JOIN surface
    "q_similarity_topk",   // 1-row broadcast query vector
    "q_similarity_lsh",    // 1-row query vector vs bucketed candidates
    "q_similarity_ivf",    // same, IVF cells
    "q_resample_gapfill")  // grid × 5 event types

  test("no accidental cartesian or nested-loop joins in the registry") {
    def nestedLoops(p: SparkPlan): Seq[String] = {
      val expanded = p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
      (p +: expanded).flatMap(_.collect {
        case _: CartesianProductExec => "CartesianProduct"
        case _: BroadcastNestedLoopJoinExec => "BroadcastNestedLoopJoin"
      })
    }
    val offenders = SparkEntry.queries.toSeq
      .filterNot { case (n, _) => intentionallyUnkeyed(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan
        val bad = nestedLoops(plan)
        if (bad.nonEmpty) Some(s"$name: ${bad.mkString(",")}") else None
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  // Shuffle-count ceilings from graft.tools.ShuffleCensus at HEAD: the
  // multi-stage pipelines plan 5 exchanges, everything else ≤ 4. A query
  // exceeding its ceiling has grown an unplanned exchange — typically a
  // lost broadcast (dimension join falling back to shuffle-hash/sort-merge)
  // or an accidental repartition — exactly the regression that multiplies
  // cost at 100 TB while staying invisible in a small-fixture bench.
  private val shuffleBudget = Map(
    "q_corpus_curate" -> 5,
    "q_dedup_cluster" -> 5).withDefaultValue(4)

  test("shuffle-count budget: no query grows an unplanned exchange") {
    // AQE defers exchange insertion — plan without it so EnsureRequirements
    // exchanges are visible (same setup as tools/ShuffleCensus); restore
    // whatever value the suite started with, not a hard-coded default
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val over = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
        val plan = fn(spark, TestSpark.sf).queryExecution.executedPlan
        val sh = plan.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.size
        if (sh > shuffleBudget(name))
          Some(s"$name: $sh shuffles > budget ${shuffleBudget(name)}")
        else None
      }
      assert(over.isEmpty, over.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}
