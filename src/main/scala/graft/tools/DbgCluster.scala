package graft.tools
import org.apache.spark.sql.SparkSession
object DbgCluster {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.01"
    val pairs = graft.operators.DedupQueries.ngramPairs(
      graft.Tables.documents(spark, sf), 9, 10)
    println("pairs=" + pairs.count())
    val labels = graft.operators.Clustering.componentLabels(pairs)
    println("labels=" + labels.count())
    spark.stop()
  }
}
