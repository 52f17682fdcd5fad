package graft.pipeline

import java.io.FileInputStream
import java.security.MessageDigest

import org.apache.spark.sql.{Row, SaveMode, SparkSession}

/** Content-hash change-detection state (pipeline operators P4/P5/P6,
  * SURVEY.md §2.1).
  *
  * Reference: chunked SHA-256 of the feed zip (dags/warsaw-gtfs.py:41-47)
  * compared against a single state blob (`latest-feed-hash`, :60-71),
  * upserted with overwrite (:73-80).
  *
  * Ordering fix: the reference writes the hash BEFORE the uploads succeed
  * (dags/warsaw-gtfs.py:106-107), so a crash mid-upload silently loses a
  * feed version. [[GtfsIngest.run]] writes state only after all table
  * writes commit (SURVEY.md §3.1 step 4 / §7.2 step 5).
  */
object FeedState {

  /** Chunked SHA-256 hex of a local file — 8 KiB chunks like the reference
    * (dags/warsaw-gtfs.py:43), bounded memory for arbitrarily large feeds. */
  def sha256OfFile(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new FileInputStream(path)
    try {
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** Existence check through the Hadoop FileSystem API so semantics match
    * the write path on any store (local, HDFS, s3a object stores) — a
    * local java.io.File check silently returns false for non-local URIs,
    * which would disable change detection and drop other feeds' state. */
  private def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Last recorded hash for `feed`, if any (missing state table = first
    * run, dags/warsaw-gtfs.py:66-67). */
  def readHash(spark: SparkSession, statePath: String, feed: String): Option[String] =
    if (!pathExists(spark, statePath)) None
    else spark.read.schema(LandingSchemas.feedState).parquet(statePath)
      .filter(org.apache.spark.sql.functions.col("feed") === feed)
      .collect().headOption.map(_.getString(1))

  /** Upsert the hash for `feed` (overwrite-the-table semantics on a
    * one-row-per-feed state table). */
  def writeHash(spark: SparkSession, statePath: String, feed: String,
      hash: String): Unit = {
    val others = if (pathExists(spark, statePath))
      spark.read.schema(LandingSchemas.feedState).parquet(statePath)
        .filter(org.apache.spark.sql.functions.col("feed") =!= feed)
        .collect().toSeq
    else Seq.empty[Row]
    val rows = others :+ Row(feed, hash)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), LandingSchemas.feedState)
    // stage-then-swap: parquet overwrite of a tiny state table
    val tmp = statePath + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dst = new org.apache.hadoop.fs.Path(statePath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** P5: true when the feed content changed since the last run (or no
    * prior state exists — dags/warsaw-gtfs.py:66-67). */
  def changed(spark: SparkSession, statePath: String, feed: String,
      newHash: String): Boolean =
    !readHash(spark, statePath, feed).contains(newHash)
}
