package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory for this engine (SURVEY.md §7.1 env).
  *
  * Local mode: shuffle partitions = cores (never the 200 default — at
  * local scale that is 200 tiny tasks of pure overhead; on a real cluster
  * size it to ~2–3× total executor cores or rely on AQE coalescing).
  * AQE on (runtime re-plan: SMJ→BHJ conversion, skew-join splitting,
  * partition coalescing). UTC session timezone for cross-engine parity.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    builder(s"local[$cores]", cores).getOrCreate()

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
