package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps the physical plans of the round-10 third-wave gates
  * (`sbt "Test/runMain graft.tools.WavePlans [name ...]"`) — the plan
  * audit pass: per gate, the formatted plan plus exchange/sort counts,
  * so the shuffle-count claims in the scaladocs are checked against the
  * actual plan, not assumed.
  */
object WavePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("t14_inverted_index", "o11_ewma", "o12_interp",
        "a19_skyline", "g6_clustering_coeff", "d22_bloom_novelty")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
      df.collect() // force AQE-final plan
      val plan = df.queryExecution.executedPlan.toString
      def count(tag: String) = plan.linesIterator.count(_.contains(tag))
      println(s"[waveplans] $n exchanges=${count("Exchange")} " +
        s"broadcasts=${count("BroadcastExchange")} sorts=${count("Sort ")} " +
        s"bnlj=${count("BroadcastNestedLoopJoin")} " +
        s"cartesian=${count("CartesianProduct")}")
      df.explain("formatted")
    }
    spark.stop()
  }
}
