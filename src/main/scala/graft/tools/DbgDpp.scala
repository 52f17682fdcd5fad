package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Scratch: find the config/shape under which DPP injects at fixture scale. */
object DbgDpp {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    graft.Tables.events(spark, "/root/testdata/sf0.01")
      .withColumn("d", dayofmonth(col("ts")))
      .write.partitionBy("d").parquet(s"$dir/events")
    val dim = (1 to 30).map(d => (d, if (d <= 3) "keep" else "drop"))
      .toDF("d_day", "tag")

    dim.write.parquet(s"$dir/dim")
    for (reuseOnly <- Seq("true", "false");
         ratio <- Seq("0.5", "50");
         dimSrc <- Seq("local", "parquet")) {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", reuseOnly)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", ratio)
      val fact = spark.read.parquet(s"$dir/events")
      val theDim = if (dimSrc == "local") dim
        else spark.read.parquet(s"$dir/dim")
      val joined = fact.join(broadcast(theDim), col("d") === col("d_day"))
        .filter(col("tag") === "keep")
        .agg(count(lit(1)), sum(length(col("props"))))
      val hit = joined.queryExecution.optimizedPlan.toString
        .contains("dynamicpruning")
      println(s"reuseOnly=$reuseOnly ratio=$ratio dim=$dimSrc dpp=$hit")
    }
    println(spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled"))
    spark.stop()
  }
}
