package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query isolation timer for ANY catalog query (the bench's
  * SPARK_GRAFT_ONLY knob only filters the headline set): one COLD run
  * (the bench cold-pass methodology — first execution in this JVM,
  * CacheRegistry released after) then `iters` hot runs, p50 printed.
  * Dev/forensic tool; never run by the driver.
  *
  * Usage: runMain graft.tools.QTime <sfDir> <iters> <q1> [q2 ...]
  * Env: QT_CPUS (default 32) — master local[n] + shuffle partitions,
  * mirroring Bench's session config.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("QT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_AQE_MIN_PARTITION", "64KB"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def pct(s: Array[Double], p: Double): Double = {
      val x = s.sorted
      x(math.min(x.length - 1, (p * x.length).toInt))
    }
    names.foreach { n =>
      val cold = run(n)
      graft.CacheRegistry.releaseAll()
      val hot = (1 to iters).map(_ => { val t = run(n); graft.CacheRegistry.releaseAll(); t }).toArray
      println(f"""{"q":"$n","cold_s":$cold%.3f,"hot_p50_s":${if (hot.nonEmpty) pct(hot, 0.5) else -1.0}%.3f,"hot_min_s":${if (hot.nonEmpty) hot.min else -1.0}%.3f,"iters":$iters}""")
    }
    spark.stop()
  }
}
