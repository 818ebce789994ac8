package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage profiler for d4_ngram_jaccard (r13 verdict #2): times each
  * stage of the AllPairs prefix-filter plan in isolation at the bench
  * decade, so an official-to-official p50 move can be attributed to a
  * specific stage constant (tokenize/cache, dfreq aggregate, prefix
  * window, candidate self-join, verify join) instead of guessed at.
  * Mirrors Dedup.ngramJaccard stage-for-stage (same exprs, same caches)
  * — kept in lockstep by eye; it is a forensic main, not a library path.
  */
object D4Prof {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$d/documents.parquet")
    val words = graft.pipeline.Dedup.words(col("text"))
    val threshold = 0.9

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    def cpuNs(): Long = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
        case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
        case _ => -1L
      }
    def jitMs(): Long = java.lang.management.ManagementFactory
      .getCompilationMXBean.getTotalCompilationTime
    def time(label: String)(body: () => Unit): Unit = {
      body(); body() // warm
      val samples = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); val c0 = cpuNs(); val j0 = jitMs(); body()
        ((System.nanoTime() - t0) / 1e6, (cpuNs() - c0) / 1e6,
          (jitMs() - j0).toDouble)
      }
      val ms = samples.map(_._1)
      println(f"D4PROF $label%-22s p50=${med(ms)}%8.1f ms  " +
        f"cpu_p50=${med(samples.map(_._2))}%8.0f ms  " +
        f"jit_p50=${med(samples.map(_._3))}%6.0f ms  " +
        ms.map(x => f"$x%.0f").mkString("[", ",", "]"))
    }

    // Stage 1: tokenize + distinct word sets (the cache both sides share).
    val sets = docs.select(col("source"), col("doc_id"),
      array_distinct(words).as("ws")).cache()
    time("sets_materialize")(() => { sets.count(): Unit })

    val toks = sets.select(col("source"), col("doc_id"),
      size(col("ws")).as("sz"), explode(col("ws")).as("w"))
    // Stage 2: document-frequency aggregate (the global token order).
    time("dfreq_agg")(() =>
      { toks.groupBy(col("w")).agg(count(lit(1)).as("df")).count(): Unit })

    val dfreq = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))
    val prefixPlan = toks.join(dfreq, "w")
      .withColumn("rank", row_number().over(byRarity))
      .filter(col("rank") <=
        col("sz") - ceil(col("sz") * lit(threshold) - lit(1e-9)) + lit(1))
      .select(col("source"), col("doc_id"), col("w"))
    // Stage 3: prefix build (join + per-doc window) — uncached cost.
    time("prefix_build")(() => { prefixPlan.count(): Unit })

    val prefix = prefixPlan.cache()
    prefix.count()
    // Stage 4: candidate self-join + distinct over the cached prefix.
    val cand = prefix.select(col("source"), col("doc_id").as("doc_a"), col("w"))
      .join(prefix.select(col("source"), col("doc_id").as("doc_b"), col("w")),
        Seq("source", "w"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
      .repartition(32, col("doc_a"), col("doc_b"))
    time("cand_selfjoin")(() => { cand.count(): Unit })

    val candC = cand.cache(); candC.count()
    // Stage 5: exact verify join against the cached word sets.
    val verify = candC
      .join(sets.select(col("doc_id").as("doc_a"), col("ws").as("ws_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ws").as("ws_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ws_a"), col("ws_b"))))
      .withColumn("uni", size(col("ws_a")) + size(col("ws_b")) - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= threshold)
    time("verify_join")(() => { verify.count(): Unit })

    // Drop the stage caches BEFORE the end-to-end timings: the gate's
    // internal plans are plan-equal to the stage plans above, so Spark's
    // CacheManager would silently serve the candidate self-join (the
    // dominant stage) from this tool's own cache and make every
    // "end-to-end" number cache-assisted — exactly the self-contamination
    // that made this tool read 2x faster than the bench until the r14
    // task-count telemetry (35 vs 99 tasks) exposed it.
    sets.unpersist(); prefix.unpersist(); candC.unpersist()
    // End-to-end (fresh caches per iteration — the operator alone).
    time("end_to_end")(() => {
      graft.pipeline.Dedup.ngramJaccard(docs, "source").count(): Unit
      graft.CacheRegistry.releaseAll()
    })
    // The bench gate exactly as Bench.run times it: Tables.documents +
    // orderBy tail, caches RETAINED across iterations (Bench releases
    // only after a query's whole series) — isolates gate-vs-operator.
    time("gate_cache_reuse")(() => {
      graft.queries.PipelineQueries.d4NgramJaccard(spark, d).count(): Unit
    })
    graft.CacheRegistry.releaseAll()
    // Same gate, caches dropped between iterations.
    time("gate_fresh_caches")(() => {
      graft.queries.PipelineQueries.d4NgramJaccard(spark, d).count(): Unit
      graft.CacheRegistry.releaseAll()
    })
    // Bench-mimic: the exact preamble Bench.run gives d4 — the probe
    // plan, two warm passes with releaseAll between them (the global
    // warm-up), then warmups WITHOUT release and timed iterations via
    // the SparkEntry map — to bisect which preamble step (if any)
    // inflates the bench's d4 constant.
    def probeOnce(): Unit =
      spark.range(0, 40000000L, 1, 32).selectExpr("sum(id * 3 + 1)").head()
    (1 to 5).foreach(_ => probeOnce())
    (1 to 2).foreach { _ =>
      graft.SparkEntry.queries("d4_ngram_jaccard")(spark, d).count()
      graft.CacheRegistry.releaseAll()
    }
    Thread.sleep(2000)
    time("gate_bench_mimic")(() => {
      graft.SparkEntry.queries("d4_ngram_jaccard")(spark, d).count(): Unit
    })
    // Long series: does per-iteration CPU climb with accumulated JVM
    // state (status-store/listener growth, codegen-cache pressure)?
    // Task telemetry splits process CPU into in-task work vs overhead.
    val taskN = new java.util.concurrent.atomic.AtomicLong
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          taskN.incrementAndGet()
          Option(e.taskMetrics).foreach(m => taskCpuNs.addAndGet(m.executorCpuTime))
          ()
        }
      })
    (1 to 24).foreach { i =>
      val t0 = System.nanoTime(); val c0 = cpuNs()
      val (tn0, tc0) = (taskN.get(), taskCpuNs.get())
      graft.SparkEntry.queries("d4_ngram_jaccard")(spark, d).count()
      println(f"D4TREND iter=$i%2d wall=${(System.nanoTime()-t0)/1e6}%6.0f ms " +
        f"cpu=${(cpuNs()-c0)/1e6}%6.0f ms tasks=${taskN.get()-tn0}%4d " +
        f"task_cpu=${(taskCpuNs.get()-tc0)/1000000L}%6d ms " +
        f"fresh=${i > 12}")
      // Second half: drop caches between iterations (the fresh shape).
      if (i > 12) graft.CacheRegistry.releaseAll()
    }
    println("D4PLAN begin")
    val gdf = graft.SparkEntry.queries("d4_ngram_jaccard")(spark, d)
    gdf.count()
    println(gdf.queryExecution.executedPlan.toString)
    println("D4PLAN end")
    println("D4CONF " + Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold").map(k =>
        k + "=" + scala.util.Try(spark.conf.get(k)).getOrElse("?"))
      .mkString(" "))
    println("D4CONF defaultParallelism=" +
      spark.sparkContext.defaultParallelism)
    spark.stop()
  }
}
