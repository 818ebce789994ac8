package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the r3 closure path: times plan construction,
  * memo key computation, memo lookup, and the warm filter+agg separately.
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    (1 to 5).foreach { i =>
      println(s"== iter $i")
      val chain = t("trustChain plan") { graft.graph.GraphData.trustChain(spark, dir) }
      val key = t("planKey") { graft.PlanKeys.planKey(chain) }
      println(s"  key defined=${key.isDefined} len=${key.map(_.length).getOrElse(0)}")
      val cl = t("closureAuto") { graft.graph.Closure.closureAuto(chain, maxDepth = 20) }
      val n = t("filter+agg count") {
        cl.get.filter(col("src") === "E0" && col("dst") === "E15")
          .agg(coalesce(sum(col("n_paths")), lit(0L)).as("n_paths")).count()
      }
      println(s"  rows=$n closure partitions=${cl.get.rdd.getNumPartitions}")
    }
    spark.stop()
  }
}
