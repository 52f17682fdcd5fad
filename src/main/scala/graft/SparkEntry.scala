package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here: a
  * DataFrame-building query in [[queries]] and (when SQL-expressible) a
  * DuckDB oracle in [[oracleSql]]. Column names and row order match between
  * the two (SURVEY.md §7.4 determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-style aggregate — the minimum end-to-end Catalyst slice. */
  def entry(spark: SparkSession): DataFrame =
    AggQueries.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++
      AggQueries.queries ++
      FuncQueries.queries ++
      NorthStarQueries.queries ++
      WindowedQueries.queries ++
      DedupQueries.queries ++
      IncrementalDedup.queries ++
      Clustering.queries ++
      TextQueries.queries ++
      CurationOps.queries ++
      Layout.queries ++
      Similarity.queries ++
      MiscQueries.queries ++
      CorpusPipeline.queries ++
      Salting.queries ++
      Cdc.queries ++
      Quantize.queries ++
      Outliers.queries ++
      TimeSeries.queries ++
      FuzzyDedup.queries ++
      Behavior.queries ++
      Geo.queries ++
      Graph.queries ++
      Privacy.queries ++
      Attribution.queries ++
      Maintenance.queries ++
      Linkage.queries ++
      QualityModel.queries ++
      TpchQueries.queries ++
      SqlSurface.queries ++
      FeatureOps.queries ++
      GeneratorOps.queries ++
      TrendOps.queries ++
      FrontierOps.queries ++
      Spark4Surface.queries ++
      StatsOps.queries ++
      AssociationOps.queries ++
      TrainMixOps.queries ++
      DataDietOps.queries ++
      graft.multimodal.MediaOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approx sketches, float folds, map literals) — the driver records a
    * weaker rows-only check for those; they are scalatest-verified instead. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++
      AggQueries.oracleSql ++
      FuncQueries.oracleSql ++
      NorthStarQueries.oracleSql ++
      WindowedQueries.oracleSql ++
      DedupQueries.oracleSql ++
      IncrementalDedup.oracleSql ++
      Clustering.oracleSql ++
      TextQueries.oracleSql ++
      CurationOps.oracleSql ++
      Layout.oracleSql ++
      Similarity.oracleSql ++
      MiscQueries.oracleSql ++
      CorpusPipeline.oracleSql ++
      Salting.oracleSql ++
      Cdc.oracleSql ++
      Quantize.oracleSql ++
      Outliers.oracleSql ++
      TimeSeries.oracleSql ++
      FuzzyDedup.oracleSql ++
      Behavior.oracleSql ++
      Geo.oracleSql ++
      Graph.oracleSql ++
      Privacy.oracleSql ++
      Attribution.oracleSql ++
      Maintenance.oracleSql ++
      Linkage.oracleSql ++
      QualityModel.oracleSql ++
      TpchQueries.oracleSql ++
      SqlSurface.oracleSql ++
      FeatureOps.oracleSql ++
      GeneratorOps.oracleSql ++
      TrendOps.oracleSql ++
      FrontierOps.oracleSql ++
      Spark4Surface.oracleSql ++
      StatsOps.oracleSql ++
      AssociationOps.oracleSql ++
      TrainMixOps.oracleSql ++
      DataDietOps.oracleSql ++
      graft.multimodal.MediaOps.oracleSql
}
