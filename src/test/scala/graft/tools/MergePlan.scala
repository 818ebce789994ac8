package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the m13_merge_full physical plan
  * (`sbt "Test/runMain graft.tools.MergePlan"`) — the plan audit for the
  * three-clause MERGE: expect one SortMergeJoin(FullOuter) with one hash
  * exchange per side (BroadcastHashJoin does not support full-outer, so
  * the single-shuffle shape IS the optimum for this operator).
  */
object MergePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.queries.MutQueries.m13MergeFull(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    println(s"[mergeplan] rows=${df.count()}")
    spark.stop()
  }
}
