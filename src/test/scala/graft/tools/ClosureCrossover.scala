package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the r3 closure→walk crossover the r8 verdict asked for
  * (`sbt "Test/runMain graft.tools.ClosureCrossover [dir]"`, default
  * benchdata/sf1 where the trust chain is ~150k edges, past the 100k
  * driver cap):
  *
  *   - driver closure (closureSmall with the cap raised to fit) —
  *     the under-cap regime extrapolated;
  *   - distributed closure (closureDistributed, log2(d) joins) —
  *     the middle regime;
  *   - frontier walk (Traverse.expand, expectTinyFrontier) — the r8
  *     fallback plan.
  *
  * Each variant reports cold build time and p50-of-5 warm query time
  * (filter src/dst + sum over the materialized artifact; the walk has
  * no artifact, so warm == full walk). The crossover conclusion goes to
  * PLANS.md.
  */
object ClosureCrossover {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/benchdata/sf1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val chain = graft.graph.GraphData.trustChain(spark, dir)
    val nEdges = chain.count()
    println(s"[crossover] dir=$dir edges=$nEdges")

    def timeSec(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def p50of(n: Int)(body: => Unit): Double = {
      val lat = (1 to n).map(_ => timeSec(body)).sorted
      lat(n / 2)
    }
    def queryOver(closure: DataFrame): Long =
      closure.filter(col("src") === "E0" && col("dst") === "E15")
        .agg(coalesce(sum(col("n_paths")), lit(0L))).head().getLong(0)

    // Driver closure, cap raised to cover this graph.
    val tDriverBuild = timeSec {
      val c = graft.graph.Closure
        .closureSmall(chain, maxDepth = 20, maxEdges = nEdges + 1).cache()
      c.count(): Unit
      driverClosure = c
    }
    val tDriverWarm = p50of(5)(queryOver(driverClosure): Unit)
    println(f"[crossover] driver_closure build=$tDriverBuild%.2fs warm_p50=$tDriverWarm%.3fs")
    driverClosure.unpersist()

    // Distributed closure.
    val tDistBuild = timeSec {
      val c = graft.graph.Closure
        .closureDistributed(chain, maxDepth = 20).get.cache()
      c.count(): Unit
      distClosure = c
    }
    val tDistWarm = p50of(5)(queryOver(distClosure): Unit)
    println(f"[crossover] dist_closure build=$tDistBuild%.2fs warm_p50=$tDistWarm%.3fs")
    distClosure.unpersist()

    // Frontier walk — no artifact, every query pays the walk.
    import spark.implicits._
    def walk(): Unit = {
      graft.graph.Traverse.expand(Seq("E0").toDF("node"), chain,
          maxDepth = 20, expectTinyFrontier = true)
        .filter(col("node") === "E15")
        .agg(count(lit(1))).head().getLong(0): Unit
      graft.CacheRegistry.releaseAll()
    }
    walk() // warm-up
    val tWalk = p50of(5)(walk())
    println(f"[crossover] walk p50=$tWalk%.3fs (per query, no artifact)")

    val breakEvenDriver = tDriverBuild / math.max(1e-9, tWalk - tDriverWarm)
    val breakEvenDist = tDistBuild / math.max(1e-9, tWalk - tDistWarm)
    println(f"[crossover] break-even: driver closure after $breakEvenDriver%.1f queries, " +
      f"distributed after $breakEvenDist%.1f queries")
    spark.stop()
  }
  private var driverClosure: DataFrame = _
  private var distClosure: DataFrame = _
}
