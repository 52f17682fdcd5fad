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
      // r17: let AQE size the partitioning of persisted plans too (off
      // by default). The session artifacts this engine persists (score
      // cells, shingle/band tables, gate stats) are contractions whose
      // natural partition count AQE derives from their SIZE; without
      // the flag the cache freezes the raw shuffle.partitions layout —
      // locally that is 32 near-empty cached partitions, so every
      // artifact-consuming stage paid a 32-task dispatch for rows that
      // fit one batch (q_eval_auc 0.54→0.40 s, q_eval_gains
      // 0.49→0.27 s). At cluster scale the same flag keeps large
      // artifacts many-partitioned — the decision is size-driven, not
      // a local constant.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
