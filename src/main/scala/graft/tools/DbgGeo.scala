package graft.tools
object DbgGeo {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val q = graft.operators.Geo.qGeoNeighborsHaversine(spark, d)
    println("rows=" + q.count())
    val t = System.nanoTime(); q.count()
    println("steady=" + ((System.nanoTime()-t)/1e9))
    spark.stop()
  }
}
