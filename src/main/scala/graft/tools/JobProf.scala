package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Job-level profile of a single catalog query: runs the query once cold
  * and once hot, and prints every Spark job the hot run schedules with
  * its wall duration and description — the breakdown that separates
  * "many small keyed stages" from "serial broadcast-build round-trips"
  * (each BroadcastExchange build is its own job in local mode, so the
  * storm is visible as a job list, not hidden inside one stage graph).
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("g14_closeness")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_AQE_MIN_PARTITION", "64KB"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val starts = mutable.Map[Int, (Long, String)]()
    val done = mutable.ArrayBuffer[(Int, Long, String)]()
    val stages = mutable.ArrayBuffer[(Int, Long, Int, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.synchronized {
          starts(js.jobId) = (js.time,
            Option(js.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.synchronized {
          starts.remove(je.jobId).foreach { case (t0, d) =>
            done += ((je.jobId, je.time - t0, d))
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val si = sc.stageInfo
          val ms = (for {a <- si.completionTime; b <- si.submissionTime}
            yield a - b).getOrElse(-1L)
          stages += ((si.stageId, ms, si.numTasks, si.name.take(80)))
        }
    })

    for (n <- names) {
      val q = graft.SparkEntry.queries(n)
      // cold pass: JIT + parquet footer cache
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      graft.CacheRegistry.releaseAll()
      Thread.sleep(300) // let queued listener events drain
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.CacheRegistry.releaseAll()
      Thread.sleep(300) // let queued listener events drain
      val jobs = done.synchronized(done.toVector)
      println(f"== $n hot wall ${wall}%.3f s, ${jobs.size} jobs, " +
        f"job-time sum ${jobs.map(_._2).sum / 1e3}%.3f s")
      jobs.sortBy(_._1).foreach { case (id, ms, d) =>
        println(f"  job $id%4d ${ms}%6d ms  ${d.take(90)}")
      }
      val sts = stages.synchronized { val v = stages.toVector; stages.clear(); v }
      sts.filter(_._2 >= 200).sortBy(-_._2).take(12).foreach {
        case (id, ms, nt, nm) =>
          println(f"  stage $id%4d ${ms}%6d ms  $nt%4d tasks  $nm")
      }
    }
    spark.stop()
  }
}
