package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage wall profile of the tree-centrality prelude on the
  * sf hierarchy — r14 forensic tool (never run by the driver).
  */
object ForestProf {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val e = t("e checkpoint") {
        graft.graph.GraphData.hierarchyEdges(spark, d).drop("child_type")
          .select(col("parent"), col("child")).distinct().localCheckpoint()
      }
      t("forest guard agg") {
        e.agg(count(lit(1)), count_distinct(col("child"))).head()
      }
      val parents = t("parents checkpoint") {
        e.select(col("parent").as("node")).distinct().localCheckpoint()
      }
      t("parents count")(parents.count())
      val flagged = t("flag join checkpoint") {
        e.join(parents.select(col("node").as("child"), lit(1).as("i")),
            Seq("child"), "left")
          .select(col("parent"), col("child"), col("i").isNotNull.as("ic"))
          .localCheckpoint()
      }
      val eInt = flagged.filter(col("ic")).select("parent", "child")
      val leafE = flagged.filter(!col("ic")).select("parent", "child")
      val leafCnt = t("leafCnt checkpoint") {
        leafE.groupBy(col("parent").as("node"))
          .agg(count(lit(1)).as("lc")).localCheckpoint()
      }
      val base = parents.join(leafCnt, Seq("node"), "left")
        .select(col("node"), (lit(1L) + coalesce(col("lc"), lit(0L))).as("base"))
      var size = parents.withColumn("size", lit(1L))
      (1 to 3).foreach { _ =>
        val fromInt = eInt.join(size.withColumnRenamed("node", "child"), "child")
          .groupBy(col("parent").as("node")).agg(sum(col("size")).as("isum"))
        size = base.join(fromInt, Seq("node"), "left")
          .select(col("node"), (col("base") + coalesce(col("isum"), lit(0L))).as("size"))
      }
      val sizeInt = t("size 3-round lazy cp")(size.localCheckpoint())
      val roots = parents.join(e.select(col("child").as("node")), Seq("node"), "left_anti")
      var comp = t("comp roots cp")(roots.withColumn("root", col("node")).localCheckpoint())
      var frontier = comp
      (1 to 3).foreach { i =>
        val next = t(s"comp round $i") {
          eInt.join(frontier.withColumnRenamed("node", "parent"), "parent")
            .select(col("child").as("node"), col("root")).localCheckpoint()
        }
        comp = t(s"comp union cp $i")(comp.unionByName(next).localCheckpoint())
        frontier = next
      }
      t("comp count")(comp.count())
      // g14's tail: down pass + rerooting + leaf extension
      var down = parents.withColumn("dsub", lit(0L))
      (1 to 4).foreach { _ =>
        val fromInt = eInt.join(down.withColumnRenamed("node", "child"), "child")
          .join(sizeInt.withColumnRenamed("node", "child"), "child")
          .groupBy(col("parent").as("node")).agg(sum(col("dsub") + col("size")).as("isum"))
        down = parents.join(leafCnt, Seq("node"), "left").join(fromInt, Seq("node"), "left")
          .select(col("node"), (coalesce(col("lc"), lit(0L)) + coalesce(col("isum"), lit(0L))).as("dsub"))
      }
      val downCp = t("down 4-round lazy cp")(down.localCheckpoint())
      val compInt = comp.join(sizeInt.select(col("node").as("root"), col("size").as("nc")), "root")
      var s = t("s roots cp") {
        compInt.filter(col("node") === col("root")).join(downCp, "node")
          .select(col("node"), col("dsub").as("dist_sum"), col("nc")).localCheckpoint()
      }
      frontier = s
      (1 to 3).foreach { i =>
        val next = t(s"s round $i") {
          eInt.join(frontier.select(col("node").as("parent"), col("dist_sum").as("sp"), col("nc")), "parent")
            .join(sizeInt.withColumnRenamed("node", "child"), "child")
            .select(col("child").as("node"), (col("sp") + col("nc") - lit(2L) * col("size")).as("dist_sum"), col("nc"))
            .localCheckpoint()
        }
        s = t(s"s union cp $i")(s.unionByName(next).localCheckpoint())
        frontier = next
      }
      val leaves = leafE.join(s.select(col("node").as("parent"), col("dist_sum").as("sp"), col("nc")), "parent")
        .select(col("child").as("node"), (col("sp") + col("nc") - lit(2L)).as("dist_sum"), col("nc"))
      t("leaf extension + final agg") {
        s.unionByName(leaves).withColumn("t", substring(col("node"), 1, 1))
          .groupBy(col("t")).agg(count(lit(1)), max(col("dist_sum"))).collect()
      }
      graft.CacheRegistry.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
