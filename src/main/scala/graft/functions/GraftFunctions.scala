package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's custom functions, so `spark.sql`
  * users get the same surface as the DataFrame API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT cosine_f(a.embedding, b.embedding) FROM ...")
  *   spark.sql("SELECT parse_delay(delay_raw) FROM delays")
  *   spark.sql("SELECT weighted_mean(l_quantity, l_extendedprice) FROM lineitem")
  * }}}
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_f", exprs => CosineSimFloat(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton16", exprs => MortonInterleave16(exprs(0), exprs(1)), "scala_udf")
    spark.udf.register("parse_delay", ParseDelay.parseDelayUdf)
    spark.udf.register("weighted_mean",
      org.apache.spark.sql.functions.udaf(WeightedMean,
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaDouble)))
  }
}
