package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: times one named SparkEntry query N times at a
  * given data dir and prints per-iteration wall ms — used to localize
  * sweep anomalies (sf0.01 closure-tier costs, d4 drift) outside the
  * full bench protocol.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val n = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(q)(spark, dir).count()
      val ms = (System.nanoTime() - t0) / 1e6
      val st = spark.sparkContext.getRDDStorageInfo
      val mb = st.map(_.memSize).sum / 1048576.0
      println(f"iter $i%2d $ms%8.1f ms rows=$c cachedRDDs=${st.length} cachedMB=$mb%.1f")
    }
    spark.stop()
  }
}
