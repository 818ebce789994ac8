package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the iterative graph KERNELS on a graph that GROWS
  * with the decade (r13): the g-gates run on the co-supplier graph,
  * whose vertex set is bounded by the 1000-supplier dimension at every
  * decade — honest for those gates, but it leaves the "do the
  * iterative joins themselves scale with edge count?" question open.
  * This probe runs the same [[graft.graph.GraphAlgos]] kernels over the
  * ORDER-LEVEL hierarchy edge table (nation→customer→orders — the
  * lineitem leaf level is dropped), which grows 10× per decade
  * (sf1 ≈ 1.7M edges, sf10 ≈ 16.6M), with the gate iteration counts
  * (PageRank 20, label propagation 5). p50 of 3 timed runs after 1
  * warm-up; cells are within-run ratios only, like WaveProbe.
  *
  * Why not the full hierarchy: with the 60M-lineitem leaf level the
  * sf10 graph is ~78M edges / 156M directed rows, and 20 PageRank
  * rounds at local[16] under a 24 GB heap GC-livelocked (GCLocker
  * retry storms) — the honest sizing note is that a ~100M-edge
  * 20-round power iteration is a CLUSTER job (per-executor rank+edge
  * partitions must fit memory), not a single-JVM one; the kernel's
  * per-iteration plan (edges partitioned once, only the rank vector
  * moves, checkpoint every 4 rounds) is exactly the shape that shards
  * across executors.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS")
      .map(_.split(',').toSeq)
      .getOrElse(Seq("/root/repo/benchdata/sf1", "/root/repo/benchdata/sf10"))
      .filter(new java.io.File(_).isDirectory)
    def orderEdges(s: SparkSession, d: String) =
      graft.graph.GraphData.hierarchyEdges(s, d)
        .filter(col("child_type") =!= "Line")
        .select(col("parent").as("src"), col("child").as("dst"))
    val kernels: Seq[(String, (SparkSession, String) => Long)] = Seq(
      "pagerank_20" -> ((s: SparkSession, d: String) =>
        graft.graph.GraphAlgos.pageRank(orderEdges(s, d), iterations = 20)
          .queryExecution.toRdd.count()),
      "labelprop_5" -> ((s: SparkSession, d: String) =>
        graft.graph.GraphAlgos.labelPropagation(orderEdges(s, d), rounds = 5)
          .queryExecution.toRdd.count()))
    kernels.foreach { case (name, fn) =>
      val cells = dirs.map { d =>
        def run(): Double = {
          val t0 = System.nanoTime()
          fn(spark, d)
          val s = (System.nanoTime() - t0) / 1e9
          graft.CacheRegistry.releaseAll()
          s
        }
        run() // warm-up
        val ts = (1 to 3).map(_ => run()).sorted
        d.split("/").last -> ts(ts.length / 2)
      }
      val line = cells.map { case (n, s) => f"$n=$s%.3f" }.mkString(" ")
      println(f"GRAPHSCALE $name%-14s $line")
    }
    spark.stop()
  }
}
