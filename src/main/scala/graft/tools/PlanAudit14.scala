package graft.tools

import org.apache.spark.sql.SparkSession
object PlanAudit14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for ((n, fn) <- Seq(
      "t29" -> graft.queries.PipelineQueries.t29QueryExpansion _,
      "t30" -> graft.queries.PipelineQueries.t30PhraseSearch _,
      "t31" -> graft.queries.PipelineQueries.t31RankEval _,
      "v8"  -> graft.queries.PipelineQueries.v8MatryoshkaTopk _)) {
      val df = fn(spark, d)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange (?!SinglePartition)".r.findAllIn(p).length
      println(s"== $n == exchanges=${p.split('\n').count(_.contains("Exchange"))} " +
        s"broadcasts=${p.split('\n').count(_.contains("BroadcastExchange"))} " +
        s"wscg=${p.split('\n').count(_.contains("WholeStageCodegen"))} " +
        s"scans=${p.split('\n').count(_.contains("FileScan"))}")
      println(p.split('\n').filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("TakeOrdered") || l.contains("Window")).map(_.trim.take(110)).mkString("\n"))
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
