package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch timing: isolate where q_map_ops spends its time. */
object DbgMapOps {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val ev = graft.Tables.events(spark, sf)

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val df = mk
      df.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s " + ts.map(t => f"$t%6.3f").mkString(" "))
    }

    val m = from_json(col("props"), MapType(StringType, IntegerType)).as("m")

    time("parse_only")(ev.select(col("event_id"), m))
    time("current_explode")(ev.select(col("event_id"), m)
      .select(col("event_id"), explode(col("m")).as(Seq("key", "val"))))
    time("map_entries_explode")(ev.select(col("event_id"), m)
      .select(col("event_id"), explode(map_entries(col("m"))).as("e"))
      .select(col("event_id"), col("e.key").as("key"), col("e.value").as("val")))
    time("inline_entries")(ev.select(col("event_id"), m)
      .select(col("event_id"), map_entries(col("m")).as("es"))
      .select(col("event_id"), inline(col("es"))))
    time("variant_parse")(ev.select(col("event_id"),
      expr("variant_get(parse_json(props), '$.k', 'int')").as("val")))
    ev.createOrReplaceTempView("dbg_events")
    val ve = spark.sql(
      """SELECT event_id, v.key, CAST(v.value AS INT) AS val
        |FROM dbg_events, LATERAL variant_explode(parse_json(props)) AS v""".stripMargin)
    time("variant_explode")(ve)
    ve.explain("formatted")
    ve.show(3)
    spark.stop()
  }
}
