package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout behaviors the 100 TB design depends on, asserted
  * against actual plans/metrics: Hive-style partition pruning and
  * bucketed co-located joins (SURVEY.md §1.3, §4.2). */
class ScaleLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitionBy layout prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, TestSpark.sf)
      .withColumn("y", year(col("ts")))
      .withColumn("m", month(col("ts")))
      .withColumn("d", dayofmonth(col("ts")))
      .write.partitionBy("y", "m", "d").parquet(s"$dir/events")

    val allDays = spark.read.parquet(s"$dir/events")
    val oneDay = allDays.filter(col("d") === 5)

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // execute so AQE finalizes
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }
      scans.map(_.metrics("numFiles").value).sum
    }
    val filesAll = scannedFiles(allDays)
    val filesOne = scannedFiles(oneDay)
    assert(filesOne < filesAll, s"pruning: $filesOne < $filesAll")
    // value-correct too
    assert(oneDay.count() ==
      Tables.events(spark, TestSpark.sf).filter(dayofmonth(col("ts")) === 5).count())
  }

  test("eventsRange pushes the time predicate to the parquet scan") {
    import org.apache.spark.sql.functions._
    val fromUs = java.time.Instant.parse("2024-01-01T06:00:00Z").toEpochMilli * 1000
    val untilUs = java.time.Instant.parse("2024-01-01T12:00:00Z").toEpochMilli * 1000
    val ranged = Tables.eventsRange(spark, TestSpark.sf, fromUs, untilUs)
    // pushed: the raw ns filter appears in PushedFilters on the scan
    val scan = ranged.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(ts"),
      s"not pushed: ${scan.metadata("PushedFilters")}")
    // and value-equal to the naive post-conversion filter
    val naive = Tables.events(spark, TestSpark.sf)
      .filter(unix_micros(col("ts")) >= fromUs && unix_micros(col("ts")) < untilUs)
    assert(ranged.count() == naive.count() && ranged.count() > 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val s2 = spark.newSession() // runtime confs only; warehouse is static
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-BHJ
    Tables.orders(s2, TestSpark.sf)
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(s2, TestSpark.sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val joined = s2.table("b_orders").join(s2.table("b_customer"), "o_custkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan
    val exec = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"bucketed join must be co-located, found ${shuffles.size} shuffle(s)")
  }

  test("dynamic partition pruning: a filtered dim prunes the fact scan at runtime") {
    import spark.implicits._
    // The 100 TB star-join shape: the fact side is day-partitioned, the
    // dim filter is only known at run time (no static partition
    // predicate on the fact), and DPP turns the dim's surviving keys
    // into a runtime partition filter on the fact scan — without it the
    // join reads every partition.
    val dir = Files.createTempDirectory("graft-dpp").toString
    Tables.events(spark, TestSpark.sf)
      .withColumn("d", dayofmonth(col("ts")))
      .write.partitionBy("d").parquet(s"$dir/events")
    val fact = spark.read.parquet(s"$dir/events")
    // the dim must be a SCAN-backed relation: PartitionPruning's
    // selective-predicate check looks for a filter over a leaf scan, so
    // an in-memory LocalRelation never triggers injection (probed in
    // round 8 — a pure Seq.toDF dim silently disables DPP)
    (1 to 30).map(d => (d, if (d <= 3) "keep" else "drop"))
      .toDF("d_day", "tag").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    // aggregate over a REAL data column: a count-only probe projects
    // zero data columns, the fact scan's size estimate collapses, and
    // DPP's pruning-has-benefit heuristic declines to inject
    val joined = fact.join(broadcast(dim),
      col("d") === col("d_day")).filter(col("tag") === "keep")
      .agg(count(lit(1)).as("n"), sum(length(col("props"))).as("bytes"))

    val n = joined.collect()(0).getLong(0)
    val expected = Tables.events(spark, TestSpark.sf)
      .filter(dayofmonth(col("ts")) <= 3).count()
    assert(n == expected)

    // query stages are leaf nodes — collect() does not descend into
    // them, so recurse through QueryStageExec.plan explicitly (the
    // same caveat as the AQE skew test)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] =
      (p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }).collect {
        case s: FileSourceScanExec => Seq(s)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(q.plan)
      }.flatten
    // fact-side scans ONLY: the dim lives under the same temp root, and
    // counting its file in prunedFiles would weaken the skip assertion
    val scans = allScans(joined.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString.contains("/events")))
    assert(scans.nonEmpty)
    // the runtime filter must appear as a partition filter on the scan,
    // and the scan must actually have skipped the pruned partitions
    assert(scans.exists(_.partitionFilters.exists(
      _.toString.contains("dynamicpruning"))),
      s"expected a dynamicpruning partition filter in:\n${scans.head}")
    val prunedFiles = scans.map(_.metrics("numFiles").value).sum
    val allFiles = {
      val full = fact.agg(count(lit(1)))
      full.collect()
      allScans(full.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    assert(prunedFiles < allFiles,
      s"DPP must skip partitions: $prunedFiles < $allFiles")
  }
}
