package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

/** CLI entry point for the three ingestion jobs — the `spark-submit`
  * surface an external scheduler (the reference keeps Airflow,
  * BASELINE `spark_approach`) would invoke per task:
  *
  * {{{
  *   graft.pipeline.Jobs gtfs    <zipPath> <warehouseDir> <statePath> <yyyy-MM-dd>
  *   graft.pipeline.Jobs delays  <csvPath> <warehouseDir> <yyyy-MM-dd> <hour>
  *   graft.pipeline.Jobs weather <payloadPath> <outDir> <yyyy-MM-dd> <hour>
  *   // P1/P2 fetch-inclusive forms (the complete reference DAG per task):
  *   graft.pipeline.Jobs gtfs-fetch    <url> <stagingZip> <warehouseDir> <statePath> <yyyy-MM-dd>
  *   graft.pipeline.Jobs weather-fetch <url> <outDir> <yyyy-MM-dd> <hour>
  * }}}
  *
  * Exit code 0 = work done, 3 = skipped (unchanged feed / existing
  * snapshot) so the scheduler can mark short-circuits distinctly, like the
  * reference's @task.short_circuit (dags/warsaw-gtfs.py:60) and existence
  * guard (dags/warsaw-weather.py:26-28).
  */
object Jobs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName(s"graft-${args.headOption.getOrElse("job")}")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val ran = args.toList match {
        case "gtfs" :: zip :: wh :: state :: date :: Nil =>
          GtfsIngest.run(spark, zip, wh, state, LocalDate.parse(date))
        case "delays" :: csv :: wh :: date :: hour :: Nil =>
          DelaysIngest.run(spark, csv, wh, LocalDate.parse(date), hour.toInt)
          true
        case "weather" :: payload :: out :: date :: hour :: Nil =>
          WeatherIngest.run(spark,
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(payload)),
            out, LocalDate.parse(date), hour.toInt)
        case "gtfs-fetch" :: url :: staging :: wh :: state :: date :: Nil =>
          GtfsIngest.fetchAndRun(spark, url,
            java.nio.file.Paths.get(staging), wh, state, LocalDate.parse(date))
        case "weather-fetch" :: url :: out :: date :: hour :: Nil =>
          WeatherIngest.fetchAndRun(spark, url, out,
            LocalDate.parse(date), hour.toInt)
        case other =>
          System.err.println(s"unknown job spec: $other")
          sys.exit(2)
      }
      if (!ran) sys.exit(3)
    } finally spark.stop()
  }
}
