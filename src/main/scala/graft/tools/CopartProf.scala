package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does co-partitioning the prelude frames remove the per-round
  * exchanges of the tree-centrality sweeps? r14 forensic tool.
  */
object CopartProf {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    val e0 = graft.graph.GraphData.hierarchyEdges(spark, d)
      .drop("child_type").select(col("parent"), col("child"))
      .distinct().localCheckpoint()
    val parents = e0.select(col("parent").as("node")).distinct()
      .localCheckpoint()
    val flagged = e0.join(parents.select(col("node").as("child"),
        lit(1).as("i")), Seq("child"), "left")
      .select(col("parent"), col("child"), col("i").isNotNull.as("ic"))
    val eIntPlain = flagged.filter(col("ic")).select("parent", "child")
      .localCheckpoint()
    val leafCnt = flagged.filter(!col("ic"))
      .groupBy(col("parent").as("node")).agg(count(lit(1)).as("lc"))
      .localCheckpoint()
    val base = parents.join(leafCnt, Seq("node"), "left")
      .select(col("node"), (lit(1L) + coalesce(col("lc"), lit(0L))).as("base"))
      .localCheckpoint()

    for (mode <- Seq("plain", "copart")) {
      val eInt = if (mode == "plain") eIntPlain
        else eIntPlain.repartition(32, col("child")).localCheckpoint()
      val b = if (mode == "plain") base
        else base.repartition(32, col("node")).localCheckpoint()
      (1 to 3).foreach { trial =>
        var size = b.select(col("node"), lit(1L).as("size"))
        (1 to 3).foreach { _ =>
          val fromInt = eInt.join(size.withColumnRenamed("node", "child"), "child")
            .groupBy(col("parent").as("node")).agg(sum(col("size")).as("isum"))
          size = b.join(fromInt, Seq("node"), "left")
            .select(col("node"), (col("base") + coalesce(col("isum"), lit(0L))).as("size"))
        }
        val cp = t(s"$mode size sweep $trial")(size.localCheckpoint())
        if (trial == 3) {
          println(cp.queryExecution.executedPlan.toString.split('\n')
            .count(_.contains("Exchange")) + " exchanges in final plan")
        }
        cp.unpersist()
      }
    }
    spark.stop()
  }
}
