package graft.tools

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's smoke check: `SparkEntry.entry` on sf0.001 must
  * return rows (`sbt "Test/runMain graft.tools.EntrySmoke"`).
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entrysmoke] rows=$n")
    require(n > 0, "entry() must return rows")
    spark.stop()
  }
}
