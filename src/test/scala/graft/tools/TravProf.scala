package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing for traversal queries across scale dirs (not a ScalaTest
  * suite — `sbt "Test/runMain graft.tools.TravProf [query] [dir] [iters]"`).
  */
object TravProf {
  def main(args: Array[String]): Unit = {
    val q = if (args.length > 0) args(0) else "r5_role_tagged"
    val dir = if (args.length > 1) args(1) else "/root/repo/benchdata/sf1"
    val iters = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Deterministic structural metrics alongside the noisy wall clock:
    // job and task counts expose scheduling overhead that timing hides.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStart.put(j.jobId, (j.time,
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
        ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.get(j.jobId)).foreach { case (t0, desc) =>
          jobLog.add(s"${j.time - t0}ms ${desc.take(120)}")
        }
        ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        { tasks.incrementAndGet(); () }
    })
    val f = graft.SparkEntry.queries(q)
    if (sys.env.contains("TRAV_EXPLAIN")) f(spark, dir).explain("formatted")
    // Default: same protocol as Bench.scaleMetrics — warm once, iterate
    // with the operator caches resident, release once at the end.
    // TRAV_COLD=1: Bench.dynamicMetrics cycle protocol — caches dropped
    // between iterations, each run is the full scenario.
    val cold = sys.env.contains("TRAV_COLD")
    f(spark, dir).count()
    if (cold) graft.CacheRegistry.releaseAll()
    val lat = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      f(spark, dir).count()
      val s = (System.nanoTime() - t0) / 1e9
      if (cold) graft.CacheRegistry.releaseAll()
      s
    }.sorted
    if (!cold) graft.CacheRegistry.releaseAll()
    println(f"[travprof] $q $dir p50=${lat(lat.length / 2)}%.3f s (n=$iters) " +
      s"jobs=${jobs.get} tasks=${tasks.get}")
    sys.env.get("TRAV_JOBLOG").foreach { path =>
      val w = new java.io.PrintWriter(path)
      jobLog.forEach(l => w.println(l))
      w.close()
    }
    spark.stop()
  }
}
