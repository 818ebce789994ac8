package graft.tools
import org.apache.spark.sql.SparkSession
object TimeHits {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val t0 = System.nanoTime
    val n = graft.queries.GraphQueries.defs("g11_hits")(spark, d).count()
    println(s"g11 rows=$n ms=${(System.nanoTime - t0) / 1000000}")
    val t1 = System.nanoTime
    val n2 = graft.queries.GraphQueries.defs("g11_hits")(spark, d).count()
    println(s"g11 warm rows=$n2 ms=${(System.nanoTime - t1) / 1000000}")
    spark.stop()
  }
}
