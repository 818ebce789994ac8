package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc decade-ratio probe for the round-12 second-wave operators —
  * the headline/sweep set is frozen for round-over-round comparability,
  * so the new gates get their scale-growth evidence from this one-off
  * (recorded in PLANS.md "Round-12 second wave"): p50 of 5 timed runs
  * after 2 warm-ups, per decade, per gate. Ratios near the data growth
  * (10×) are linear; well under it, index/pushdown shapes.
  */
object WaveProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val gates = if (args.nonEmpty) args.toSeq else Seq(
      "d37_dup_spans", "d42_span_scrub", "d38_chunk_scrub",
      "d40_decontaminate_spans", "d41_ppl_buckets", "t20_gopher_rules",
      "w13_decontam_tags_twin", "a32_psi_drift", "v4_kcenter_coreset",
      "ann_ivfpq_topk")
    // SPARK_GRAFT_PROBE_DIRS / SPARK_GRAFT_PROBE_RUNS override the
    // decade list and the timed-run count (e.g. the one-off sf10 probe:
    // big decades get 3 timed runs instead of 5).
    val dirs = sys.env.get("SPARK_GRAFT_PROBE_DIRS")
      .map(_.split(',').toSeq)
      .getOrElse(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/benchdata/sf1"))
      .filter(new java.io.File(_).isDirectory)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "5").toInt
    gates.foreach { g =>
      val fn = graft.SparkEntry.queries(g)
      val cells = dirs.map { d =>
        def run(): Double = {
          val t0 = System.nanoTime()
          // toRdd.count() forces the FULL physical plan: a plain count()
          // lets Catalyst prune a unique-key left join whose columns the
          // count never reads (measured: d42 read a flat 0.13 s at every
          // decade — the probe was timing docs.count()).
          fn(spark, d).queryExecution.toRdd.count()
          val s = (System.nanoTime() - t0) / 1e9
          graft.CacheRegistry.releaseAll()
          s
        }
        run(); run() // warm-ups
        val ts = (1 to runs).map(_ => run()).sorted
        d.split("/").last -> ts(ts.length / 2)
      }
      val line = cells.map { case (n, s) => f"$n=$s%.3f" }.mkString(" ")
      println(f"WAVEPROBE $g%-24s $line")
    }
    spark.stop()
  }
}
