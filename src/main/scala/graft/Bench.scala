package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — mirrors the reference harness's measurement protocol
  * (BASELINE.md): two untimed warm-ups per query (buffer cache + codegen
  * JIT, like demo_did_graph/03_equalization/benchmark_scenario_a.py:75-78),
  * then N timed executions; reports per-query P50/P95/P99 latency (ms) and
  * throughput (q/s) exactly as common/bench_utils.py:37-60 does — plus min
  * and stddev, so round-over-round comparisons can tell a plan change from
  * JIT/GC noise — plus the driver-contract total/queries fields.
  * Iterations default to 20: at local[32] with concurrent GC, 5 samples
  * cannot resolve a 2x latency change (observed 3-6x p50 swings on
  * identical code).
  *
  * Headline set = the BASELINE.md Q1-Q7 shapes plus the heaviest pipeline
  * operators; the remaining catalog queries run once (cold) so the full
  * surface stays exercised.
  *
  * Output protocol: the harness that captures this process keeps only the
  * LAST ~2 KB of stdout, so evidence is ordered for a tail capture — each
  * section prints as its own `{"block":...}` line as soon as it is
  * computed (full precision), the complete line set is also written to
  * `BENCH_FULL.jsonl`, and the FINAL line is a compact (<2 KB) standalone
  * JSON object carrying the driver contract fields plus the headline
  * stats, e2e latency segments, dynamic cycle p50s, and the top scale
  * ratio — the facts a tail reader must always see.
  */
object Bench {

  // Q1..Q7 analogs + pipeline heavies (see BASELINE.md table).
  private val headline = Seq(
    "r1_chain_levels",    // Q1 recursive chain count
    "r5_role_tagged",     // Q2 role-tagged expansion
    "j5_three_way_join",  // Q3 expansion ⋈ fact
    "j8_hier_vc_count",   // Q4 var-length + reverse expand
    "r3_wot_path_count",  // Q5 WoT path count
    "r4_abac_decision",   // Q6 ABAC decision
    "m8_cdc_apply",       // Q7 CDC apply
    "q1_agg", "d2_minhash_lsh", "ann_topk", "d5_embed_cosine",
    "u2_vc_roundtrip",
    "u1_sig_roundtrip",   // crypto throughput: the catalog's heaviest row count
    "d4_ngram_jaccard",   // prefix-filtered AllPairs join (round-8 path)
    "j12_asof_attribution", // as-of join sweep (round-9 operator)
    "j16_interval_overlap", // bucketed interval-overlap join (round-10 operator)
    "g3_sssp",            // bounded-hop Bellman-Ford (round-10 graph analytics)
    "g7_label_propagation", // fixed-round community voting (round-10 closing wave)
    "d25_containment",    // one-sided-prefix containment dedup (round-10 closing wave)
    "o13_window_distinct", // sliding distinct count (round-10 closing wave)
    "d26_snm_dedup",      // sorted-neighborhood dedup over GlobalRank (round-10)
    "g8_common_neighbors") // wedge-join link prediction (round-10)

  /** Generated third scale decade (scripts: [[graft.scale.ScaleGen]]) —
    * appended to the sweep whenever it exists on disk.
    */
  private val Sf1Dir = "/root/repo/benchdata/sf1"

  private def pct(sorted: Array[Double], p: Double): Double = {
    if (sorted.isEmpty) return 0.0
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (pos - lo)
  }

  // ---- In-process straggler forensics (r9). The r7/r8 tail outliers
  // ---- could only be chased with an external GC log correlated by hand;
  // ---- sampling the JVM's own counters around every timed iteration
  // ---- attributes a slow iteration to GC pause, JIT recompilation, or
  // ---- block-store growth in the evidence itself.
  private def gcStats(): (Long, Long) = {
    var ms = 0L; var n = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .forEach { b =>
        if (b.getCollectionTime > 0) ms += b.getCollectionTime
        if (b.getCollectionCount > 0) n += b.getCollectionCount
      }
    (ms, n)
  }
  private def jitMs(): Long = {
    val c = java.lang.management.ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported)
      c.getTotalCompilationTime else 0L
  }
  // Guarded against a stopped context: the r10 driver capture died with
  // "Cannot call methods on a stopped SparkContext" raised HERE (via
  // timedIter ← scaleMetrics) after the driver's wall-clock kill fired
  // the shutdown hook mid-block — a metric read must degrade to a
  // sentinel, never abort the evidence stream.
  private def storageMb(spark: SparkSession): Double =
    if (spark.sparkContext.isStopped) -1.0
    else try spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1048576.0
    catch { case _: Throwable => -1.0 }

  // Cache-eviction telemetry (r12 verdict #1): bytes of cached blocks
  // currently ON DISK. The level/edge caches are pinned
  // MEMORY_AND_DISK, so memory pressure shows up here as a nonzero
  // disk residue instead of a silent recompute — a future flatness
  // failure self-attributes from the evidence (disk_mb climbing across
  // iterations = the store is evicting under pressure).
  private def storageDiskMb(spark: SparkSession): Double =
    if (spark.sparkContext.isStopped) -1.0
    else try spark.sparkContext.getRDDStorageInfo.map(_.diskSize).sum / 1048576.0
    catch { case _: Throwable => -1.0 }

  private def heapUsedMb(): Double =
    java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed / 1048576.0

  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** Hypervisor CPU-steal counters from /proc/stat: (steal, total)
    * jiffies. Steal is the r14 discovery behind the "unexplained"
    * official-to-official bands (d4 734→1133 ms with code+plan
    * git-identical): this sandbox is a microVM whose host intermittently
    * steals 0–9% of CPU capacity (measured minute-to-minute under a
    * full 32-core spin), invisible to load average and to process-CPU
    * accounting. A per-iteration steal delta names that mechanism
    * in-band. (-1,-1) where /proc/stat is unreadable.
    */
  private def stealSample(): (Long, Long) =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val parts = src.getLines().next().trim.split("\\s+").drop(1)
          .map(_.toLong)
        (if (parts.length > 7) parts(7) else 0L, parts.sum)
      } finally src.close()
    } catch { case _: Exception => (-1L, -1L) }

  /** One timed execution plus its JVM-counter deltas. cpuMs vs wall time
    * is the co-activity discriminator: a straggler iteration whose
    * process-CPU delta matches the normal iterations was descheduled by
    * something OUTSIDE this JVM (harness co-activity on the same cores),
    * while a genuine plan/GC regression burns the extra time as our own
    * CPU or shows in gcMs. sysLoad (1-min run-queue average, whole
    * machine) names external load directly.
    */
  private case class IterSample(sec: Double, gcMs: Long, gcN: Long,
      jitMs: Long, storageMb: Double, cpuMs: Long, sysLoad: Double,
      diskMb: Double, heapMb: Double, stealPct: Double)
  private def timedIter(spark: SparkSession, body: () => Double): IterSample = {
    val (g0, n0) = gcStats(); val j0 = jitMs(); val c0 = processCpuNs()
    val (st0, tot0) = stealSample()
    val sec = body()
    val (g1, n1) = gcStats()
    val (st1, tot1) = stealSample()
    val cpuMs = if (c0 < 0) -1L else (processCpuNs() - c0) / 1000000L
    val stealPct =
      if (st0 < 0 || st1 < 0 || tot1 <= tot0) -1.0
      else 100.0 * (st1 - st0) / (tot1 - tot0)
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    IterSample(sec, g1 - g0, n1 - n0, jitMs() - j0, storageMb(spark),
      cpuMs, load, storageDiskMb(spark), heapUsedMb(), stealPct)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val itersRequested = sys.env.getOrElse("SPARK_GRAFT_ITERS", "20").toInt
    // ---- Wall-clock budget guard (r10 verdict #1): the driver's capture
    // ---- of the r10 run was killed at its wall-clock limit (rc 124) on a
    // ---- contended machine, leaving the round with NO valid official
    // ---- record. The bench now runs against an explicit budget: every
    // ---- block (and every sweep decade) checks remaining time first and
    // ---- records an explicit skip instead of running past it, so the
    // ---- process always reaches its final contract line and exits 0.
    // ---- Default: the r9 official full run (rc 0) measured 1072 s of
    // ---- sbt wall on a quiet machine with a smaller catalog; 2400 s
    // ---- holds the grown catalog on a quiet machine and degrades
    // ---- gracefully (scale decades first, then cold tail) under the
    // ---- ~3x contention the r10 capture showed.
    val t0Wall = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - t0Wall) / 1e9
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_TIME_BUDGET_S", "2400").toDouble
    def remainingS: Double = budgetS - elapsedS
    // block → reason, carried into the final line so a degraded run is
    // self-describing rather than silently thin.
    val skips = scala.collection.mutable.LinkedHashMap[String, String]()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE's coalescing target is BYTES (default minPartitionSize 1MB),
      // which serializes CPU-dense-but-byte-small stages: a ≤1MB shuffle
      // feeding per-row crypto/levenshtein/regex or an exploding Generate
      // collapses to ONE task and runs single-core (r15, measured: d27's
      // two 5 s one-task stages, m8 −46%, d25/d26/g8 −22%, j5/r1 −20%
      // hot p50 after the change). 64KB keeps coalescing for truly tiny
      // shuffles while letting parallelismFirst honor the session's
      // core count; at cluster scale partitions exceed 1MB anyway, so
      // the setting is a no-op there. Env-overridable for bigger-cluster
      // tuning.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("GRAFT_AQE_MIN_PARTITION", "64KB"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Filtered runs (SPARK_GRAFT_ONLY / SPARK_GRAFT_BLOCKS — dev/forensic
    // protocol) must never overwrite the official full-run evidence: a
    // debug rerun silently replacing BENCH_FULL.jsonl with empty blocks
    // is exactly the kind of evidence corruption the round-10 protocol
    // exists to prevent. They get their own sidecar file.
    // Declared BEFORE the rc-0 try so the abort path writes through the
    // same emit — the r11 catch printed its aborted line with a bare
    // println, leaving the persisted full log without the abort record
    // (r11 ADVICE).
    val isFiltered = sys.env.contains("SPARK_GRAFT_ONLY") ||
      sys.env.contains("SPARK_GRAFT_BLOCKS") ||
      sys.env.get("SPARK_GRAFT_FORCE_CONTENDED").contains("1")
    val fullPath = if (isFiltered) "/root/repo/BENCH_DEBUG.jsonl"
      else "/root/repo/BENCH_FULL.jsonl"
    val fullOut = try {
      Some(new java.io.PrintWriter(new java.io.FileWriter(fullPath, false)))
    } catch { case _: Exception => None }
    @volatile var fullOutOpen = true
    def emit(line: String): Unit = {
      // Every block line carries the run clock so a partial capture (or a
      // post-mortem of a killed run) can see exactly where the wall went.
      val stamped =
        if (line.startsWith("{") && line.endsWith("}"))
          line.dropRight(1) + f""","elapsed_s":$elapsedS%.0f}"""
        else line
      println(stamped)
      if (fullOutOpen) fullOut.foreach { w => w.println(stamped); w.flush() }
    }

    // rc-0 guarantee (r10 verdict #1): whatever happens past this point —
    // a stopped context from a shutdown hook, an OOM in one block, a bug —
    // the process still prints a complete, parseable final contract line
    // and returns normally. The error is IN the line, not in the exit code.
    try {

    // Forensic task telemetry (dev only, SPARK_GRAFT_TASK_DEBUG=1): counts
    // completed tasks and their executor CPU so a wall/process-CPU gap
    // between this harness and a dedicated tool JVM can be split into
    // in-task work vs JVM overhead (JIT/GC/listeners).
    val taskN = new java.util.concurrent.atomic.AtomicLong
    val taskCpuNs = new java.util.concurrent.atomic.AtomicLong
    if (sys.env.get("SPARK_GRAFT_TASK_DEBUG").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
            taskN.incrementAndGet()
            Option(e.taskMetrics)
              .foreach(m => taskCpuNs.addAndGet(m.executorCpuTime))
            ()
          }
        })

    // Failed queries record the exception class instead of a silent -1.
    val runErrors = scala.collection.mutable.LinkedHashMap[String, String]()
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        runErrors(name) = e.getClass.getSimpleName; return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Iteration aid: SPARK_GRAFT_ONLY="a,b" restricts the headline set and
    // skips the cold pass + cdc/dynamic blocks. Not used by the driver.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Isolated-block reruns: SPARK_GRAFT_BLOCKS="dynamic" runs ONLY the
    // named blocks (headline, cold, cdc, prepared, dynamic, e2e, scale)
    // in a fresh JVM — the evidence protocol for attributing a block's
    // regression to its own code vs contamination from the blocks that
    // normally precede it in a full run. Not set by the driver.
    val blocks = sys.env.get("SPARK_GRAFT_BLOCKS").map(_.split(",").toSet)
    def blockOn(b: String): Boolean = blocks.forall(_.contains(b))

    val perQuery = scala.collection.mutable.LinkedHashMap[String, Double]()
    val stats = scala.collection.mutable.LinkedHashMap[String, String]()
    val compact = scala.collection.mutable.LinkedHashMap[String, String]()

    val steadyP50 = scala.collection.mutable.LinkedHashMap[String, Double]()

    // ---- Driver-environment sanity probe (r10 verdict #3): a fixed
    // ---- ~50 ms-class CPU-bound task with a band recorded from a quiet
    // ---- run of THIS machine. A contended sandbox (the r10 capture: a
    // ---- pure-CPU query slowed 2.3x, 86 s stalls on a 412 ms query,
    // ---- the JVM at 4.8% CPU) shows up here; the run is then marked
    // ---- contended:true in the final line — self-describing instead of
    // ---- indistinguishable from regression — the iteration counts
    // ---- halve (never exceeding what was requested), and the block
    // ---- order flips to essentials-first (see below).
    def probeOnce(): Double = {
      val t = System.nanoTime()
      spark.range(0, 40000000L, 1, cpus.toInt)
        .selectExpr("sum(id * 3 + 1)").head()
      (System.nanoTime() - t) / 1e6
    }

    // ---- EARLY contention probe (r11 verdict #1a): the official probe
    // ---- below runs after the full warm-up — on the r11 driver sandbox
    // ---- that meant ~24 minutes of budget burned before the first
    // ---- contention evidence existed. This one runs on the cold-ish
    // ---- JVM against its own band (residual JIT keeps the probe near
    // ---- ~300 ms here even on a quiet machine — measured 270-320 ms in
    // ---- lightly-warmed runs), and a contended verdict TIME-BOXES the
    // ---- warm-up phase instead of letting it eat the budget.
    probeOnce(); probeOnce() // probe-plan codegen warm (untimed)
    // Dev/forensic knob: exercises the contended degradation path on a
    // quiet machine (the path otherwise only runs on a sick sandbox,
    // where its own evidence is the only witness). Never set by the
    // driver.
    val forceContended = sys.env.get("SPARK_GRAFT_FORCE_CONTENDED")
      .contains("1")
    val earlyProbeMs = (1 to 3).map(_ => probeOnce()).sorted.apply(1)
    val EarlyBandMs = 330.0
    val earlyContended = forceContended || earlyProbeMs > 2 * EarlyBandMs
    emit(f"""{"block":"early_probe","probe_ms":$earlyProbeMs%.1f,""" +
      f""""band_ms":$EarlyBandMs%.1f,"contended":$earlyContended}""")

    // One untimed GLOBAL warm-up pass before any timing: the first
    // measured query in a cold JVM otherwise absorbs the session's JIT
    // warm-in into its own p50 (r1, first in protocol order, read
    // 549 ms headline vs 324 ms in the late-run sweep over identical
    // data — its jit_ms series showed 2.6 s of compilation landing in
    // early timed iterations). One pass spreads compilation across all
    // query shapes for ~15 s of wall, and the sweep self-check holds.
    val toTime = headline.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n)))
      .filter(_ => blockOn("headline"))
    // Two passes on a quiet machine: the second matures the driver's
    // Catalyst analysis/optimization paths (not just executor JIT),
    // which otherwise keeps improving across the whole run and leaves
    // the early-timed queries' steady state above the late-run sweep's.
    // Under early-probe contention the phase is time-boxed (r11 verdict
    // #1a): ONE pass, hard-capped at 120 s wall — warmth is worth less
    // than headline completeness on a sick machine, and the queries a
    // cap skips are named in the evidence.
    val warmupDeadlineNs = System.nanoTime() +
      (if (earlyContended) 120L else 100000L) * 1000000000L
    val warmPasses = if (earlyContended) 1 else 2
    var warmupSkipped = 0
    (1 to warmPasses).foreach { _ =>
      toTime.foreach { n =>
        if (System.nanoTime() > warmupDeadlineNs) warmupSkipped += 1
        else { run(n); CacheRegistry.releaseAll() }
      }
    }
    // The warm-up pass floods the C2 queue; background compile threads
    // then burn cores under the FIRST timed queries (r9 evidence: r1's
    // early iterations at cpu_ms 970 vs 430 steady, descending wall
    // 183→123 ms, jit_ms nonzero throughout). Let the queue drain before
    // timing — the JMH settle pattern: wait until the compilation-time
    // delta over a 500 ms window drops under 25 ms, capped at 30 s
    // (10 s when the early probe read contended — on a machine being
    // stolen from, the queue may never drain and the wait is pure loss).
    if (toTime.nonEmpty) locally {
      val capNs = (if (earlyContended) 10L else 30L) * 1000000000L
      val t0 = System.nanoTime(); var last = jitMs(); var settled = false
      while (!settled && (System.nanoTime() - t0) < capNs) {
        Thread.sleep(500)
        val now = jitMs()
        settled = now - last < 25
        last = now
      }
      emit(s"""{"block":"warmup","jit_settle_wait_ms":${
        (System.nanoTime() - t0) / 1000000},"settled":$settled,""" +
        s""""passes":$warmPasses,"warmups_skipped":$warmupSkipped,""" +
        s""""time_boxed":$earlyContended}""")
    }

    // Official probe — the steady-state position (after warm-up + JIT
    // settle, so the sample is contention, not compilation). Quiet-
    // machine band (local[32], this repo's dev sandbox at sys_load
    // <2/32): measured 104-107 ms in the r11 official runs; 120 ms band,
    // threshold 2x. The asymmetry is deliberate — a false "contended"
    // merely halves iterations and says so in the evidence, while a
    // missed r10-grade contention (2-3x CPU slowdown → probe 300+ ms)
    // ships another sick official record. Filtered dev runs may read
    // contended:true spuriously; they are not official evidence
    // (BENCH_DEBUG sidecar).
    val probeMs = (1 to 3).map(_ => probeOnce()).sorted.apply(1)
    val ProbeBandMs = 120.0
    // Either probe position can name the contention: the early one
    // catches a sandbox that is sick from the start (and has already
    // time-boxed the warm-up), the official one catches load that
    // arrived during warm-up.
    val contended = earlyContended || probeMs > 2 * ProbeBandMs
    val iters = if (contended)
      math.min(itersRequested, math.max(5, itersRequested / 2))
    else itersRequested
    emit(f"""{"block":"env_probe","probe_ms":$probeMs%.1f,""" +
      f""""band_ms":$ProbeBandMs%.1f,"early_probe_ms":$earlyProbeMs%.1f,""" +
      f""""contended":$contended,""" +
      s""""iterations_requested":$itersRequested,"iterations":$iters,""" +
      f""""budget_s":$budgetS%.0f}""")

    // Machine-checked flatness (round-10 protocol): a headline series
    // whose p95 exceeds 2x p50, or whose first-half p50 exceeds 1.5x its
    // second-half p50, is NOT steady-state evidence — the r9 official run
    // shipped a bimodal r1 series (iterations 1-10 at ~1.2 s, 11-20 at
    // ~160 ms) under a commit message claiming clean tails. The check
    // runs on every headline query; one retime from the now-warm state
    // is allowed and BOTH series are committed (first attempt preserved
    // in the stats), so a contaminated first series can never silently
    // become the official number, and a still-unflat retry fails the
    // block in the evidence itself.
    val flatness = scala.collection.mutable.LinkedHashMap[String, String]()
    var flatnessPass = true
    def halves(runOrder: Array[Double]): (Double, Double) = (
      pct(runOrder.take(runOrder.length / 2).sorted, 0.5),
      pct(runOrder.drop(runOrder.length / 2).sorted, 0.5))
    def isFlat(runOrder: Array[Double]): Boolean =
      runOrder.length < 4 || {
        val lat = runOrder.sorted
        val (h1, h2) = halves(runOrder)
        pct(lat, 0.95) <= 2 * pct(lat, 0.5) && (h2 <= 0 || h1 / h2 <= 1.5)
      }

    // Headline completeness first (r11 verdict #1 "done" criterion: a
    // COMPLETE headline table no matter the sandbox state). Instead of
    // the r11 all-or-nothing 600 s reserve — which under contention
    // skipped the whole tail of the table — the pass DEGRADES: when the
    // remaining budget falls under the reserve, the remaining queries
    // run in essentials mode (2 warm-ups, iters/2 timed, no retime)
    // rather than not at all; only a true emergency (< 180 s, barely the
    // final line + one slow query) records a skip.
    val headlineSkipped = scala.collection.mutable.ArrayBuffer[String]()
    val headlineReduced = scala.collection.mutable.ArrayBuffer[String]()
    toTime.foreach { name =>
      if (remainingS < 180 || spark.sparkContext.isStopped) {
        headlineSkipped += name
      } else {
      val tight = remainingS < 600
      if (tight) headlineReduced += name
      val qIters = if (tight) math.max(3, iters / 2) else iters
      // Adaptive warm-up: minimum two untimed runs (the reference's
      // protocol), then keep warming until the last three warm-up times
      // sit inside a 1.4x max/min band, capped at 8 total — absorbs
      // machine-state contamination (page-cache churn from a process
      // that ran just before the bench) that a fixed two-run warm-up
      // leaked into the r9 timed series as a bimodal first half. On a
      // contended machine the band may NEVER hold — cap at 3 there
      // (the extra warm-ups are pure budget loss; the flatness check
      // still names an unflat series in the evidence).
      val warmCap = if (contended || tight) 3 else 8
      val warm = scala.collection.mutable.ArrayBuffer[Double]()
      // Forensic plan dump (dev only, never set by the driver): emits the
      // executed physical plan of each headline query from THIS process,
      // so a bench-vs-tool constant gap can be checked for plan drift
      // (AQE decisions, join strategies) instead of guessed at.
      if (sys.env.get("SPARK_GRAFT_PLAN_DUMP").contains("1")) {
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.count()
          emit(s"""{"block":"plan_dump","name":"$name"}""")
          println(df.queryExecution.executedPlan.toString)
        } catch { case _: Throwable => () }
      }
      warm += run(name); warm += run(name)
      while (warm.length < warmCap && {
        val w = warm.takeRight(3)
        w.length < 3 || w.exists(_ < 0) || w.max > 1.4 * w.min
      }) warm += run(name)

      def timeSeries(): Array[IterSample] = (1 to qIters).map { _ =>
        val (n0, c0) = (taskN.get(), taskCpuNs.get())
        val s = timedIter(spark, () => run(name))
        if (sys.env.get("SPARK_GRAFT_TASK_DEBUG").contains("1"))
          emit(s"""{"block":"task_debug","name":"$name",""" +
            s""""tasks":${taskN.get() - n0},""" +
            s""""task_cpu_ms":${(taskCpuNs.get() - c0) / 1000000L},""" +
            f""""wall_ms":${s.sec * 1000}%.0f}""")
        s
      }.filter(_.sec >= 0).toArray
      var iterSamples = timeSeries()
      var firstAttempt: Option[Array[Double]] = None
      // The one-retime-from-warm-state allowance costs a full series —
      // skip it in essentials mode (the unflat first series is still
      // named by the flatness block).
      if (!tight && iterSamples.nonEmpty && !isFlat(iterSamples.map(_.sec))) {
        firstAttempt = Some(iterSamples.map(_.sec))
        iterSamples = timeSeries()
      }
      val runOrder = iterSamples.map(_.sec)
      if (runOrder.length >= 4) {
        val lat0 = runOrder.sorted
        val (h1, h2) = halves(runOrder)
        val pass = isFlat(runOrder)
        if (!pass) flatnessPass = false
        // Self-adjudicating unflatness (r13 verdict #1): an unflat series
        // names its own mechanism IN the flatness record — the r12/r13
        // driver captures were unflat-under-contention and the exonerating
        // evidence (cpu/evict attribution) lived only in the main loop's
        // straggler records, outside the retime series. Reference point is
        // the FAST half's p50; every iteration >= 1.5x it is attributed
        // with the same gc/evict/external/cpu discriminator the straggler
        // records use (gc delta explains the excess -> "gc"; cached blocks
        // pushed to disk -> "evict"; our own process-CPU stayed at the
        // fast-iteration level, i.e. the JVM was descheduled -> "external";
        // we genuinely burned the cycles -> "cpu"), and the majority cause
        // plus the series' max 1-min run-queue load ride in-band, so a
        // contended capture reads "external" with no out-of-band rerun.
        val ref0 = math.min(h1, h2)
        val ref = if (ref0 > 0) ref0 else pct(lat0, 0.5)
        val fastIters = iterSamples.filter(_.sec < 1.5 * ref)
        val fastCpu =
          (if (fastIters.nonEmpty) fastIters else iterSamples)
            .map(_.cpuMs.toDouble).sorted
        val medCpuFast = pct(fastCpu, 0.5)
        val slowCauses = iterSamples.filter(_.sec >= 1.5 * ref).map { s =>
          val excess = (s.sec - ref) * 1000
          if (s.gcMs > 0.5 * excess) "gc"
          else if (s.stealPct > 2.0) "steal" // hypervisor took the cores
          else if (s.diskMb > 0) "evict"
          else if (s.cpuMs >= 0 && s.cpuMs < medCpuFast + 0.5 * excess)
            "external"
          else "cpu"
        }
        val cause =
          if (pass) "flat"
          else if (slowCauses.isEmpty) "unknown"
          else slowCauses.groupBy(identity)
            .maxBy { case (c, v) => (v.length, c) }._1
        val causesJson =
          if (pass) "[]"
          else slowCauses.map(c => s""""$c"""").mkString("[", ",", "]")
        flatness(name) =
          f"""{"p95_over_p50":${pct(lat0, 0.95) / pct(lat0, 0.5)}%.2f,""" +
            f""""half_ratio":${if (h2 > 0) h1 / h2 else 0.0}%.2f,""" +
            s""""retimed":${firstAttempt.nonEmpty},"warmups":${warm.length},""" +
            s""""cause":"$cause","slow_iters":${slowCauses.length},""" +
            s""""slow_causes":$causesJson,""" +
            f""""sys_load_max":${iterSamples.map(_.sysLoad).max}%.1f,""" +
            f""""steal_pct_max":${iterSamples.map(_.stealPct).max}%.1f,""" +
            s""""pass":$pass}"""
      }
      firstAttempt.foreach { fa =>
        stats(name + "__first_attempt") = s""""unflat series, retimed once; """ +
          s"""run-order ms: ${fa.map(x => f"${x * 1000}%.1f").mkString("[", ",", "]")}""""
      }
      // Steady-state estimate for the sweep self-check: median of the
      // last half of the series. The early iterations of the FIRST
      // queries in this block still carry residual JIT (evidenced in
      // their jit_ms arrays even after the settle barrier); the sweep
      // runs in a fully-warm JVM, so comparing its cells against a p50
      // that straddles the warm-in would read as a false mismatch.
      if (runOrder.length >= 4)
        steadyP50(name) = pct(
          runOrder.takeRight(runOrder.length / 2).sorted.toArray, 0.5)
      val lat = runOrder.sorted
      if (lat.nonEmpty) {
        val total = lat.sum
        val mean = total / lat.length
        val sd = math.sqrt(lat.map(x => (x - mean) * (x - mean)).sum / lat.length)
        perQuery(name) = pct(lat, 0.5)
        // samples_ms is the raw series in RUN ORDER (not sorted):
        // aggregates can't localize ~2 bad iterations out of 20, and run
        // order is what correlates against the per-iteration JVM-counter
        // deltas emitted alongside (gc_ms / gc_n / jit_ms / cached_mb).
        val samples = runOrder.map(x => f"${x * 1000}%.1f").mkString("[", ",", "]")
        val gcArr = iterSamples.map(_.gcMs).mkString("[", ",", "]")
        val gcNArr = iterSamples.map(_.gcN).mkString("[", ",", "]")
        val jitArr = iterSamples.map(_.jitMs).mkString("[", ",", "]")
        val memArr = iterSamples.map(s => f"${s.storageMb}%.1f")
          .mkString("[", ",", "]")
        // Straggler self-diagnosis: any iteration past 2x p50 is named in
        // the evidence itself — "gc" when the GC delta explains most of
        // the excess, "external" when our own process-CPU stayed at its
        // normal level (the JVM was descheduled: load outside this
        // process), "cpu" when we genuinely burned the extra cycles (a
        // real plan regression). This is the discriminator the r7/r8
        // tails lacked; no reproduction run needed to attribute them.
        val p50w = pct(lat, 0.5) * 1000
        val cpuSorted = iterSamples.map(_.cpuMs.toDouble).sorted
        val medCpu = pct(cpuSorted, 0.5)
        val stragglers = iterSamples.zipWithIndex.collect {
          case (s, i) if s.sec * 1000 > 2 * p50w =>
            val excess = s.sec * 1000 - p50w
            val cause =
              if (s.gcMs > 0.5 * excess) "gc"
              else if (s.stealPct > 2.0) "steal" // hypervisor co-activity
              else if (s.diskMb > 0) "evict" // cached blocks pushed to disk
              else if (s.cpuMs >= 0 && s.cpuMs < medCpu + 0.5 * excess)
                "external"
              else "cpu"
            f"""{"iter":$i,"ms":${s.sec * 1000}%.0f,"cause":"$cause"}"""
        }
        // BOTH p50 bases are first-class evidence (r9 verdict item 6):
        // official p50 over the full series, steady_p50 over its last
        // half — so round-over-round comparisons never have to re-derive
        // steady state from the raw samples.
        stats(name) =
          f"""{"p50_ms":${pct(lat, 0.5) * 1000}%.2f,"p95_ms":${pct(lat, 0.95) * 1000}%.2f,""" +
          f""""p99_ms":${pct(lat, 0.99) * 1000}%.2f,"min_ms":${lat.head * 1000}%.2f,""" +
          f""""steady_p50_ms":${steadyP50.getOrElse(name, pct(lat, 0.5)) * 1000}%.2f,""" +
          f""""stddev_ms":${sd * 1000}%.2f,"tps":${lat.length / total}%.3f,""" +
          s""""samples_ms":$samples,"gc_ms":$gcArr,"gc_n":$gcNArr,""" +
          s""""jit_ms":$jitArr,"cached_mb":$memArr,""" +
          s""""cached_disk_mb":${iterSamples.map(s => f"${s.diskMb}%.1f")
            .mkString("[", ",", "]")},""" +
          s""""heap_mb":${iterSamples.map(s => f"${s.heapMb}%.0f")
            .mkString("[", ",", "]")},""" +
          s""""cpu_ms":${iterSamples.map(_.cpuMs).mkString("[", ",", "]")},""" +
          s""""sys_load":${iterSamples.map(s => f"${s.sysLoad}%.1f")
            .mkString("[", ",", "]")},""" +
          s""""steal_pct":${iterSamples.map(s => f"${s.stealPct}%.1f")
            .mkString("[", ",", "]")},""" +
          s""""stragglers":${stragglers.mkString("[", ",", "]")}}"""
        // Compact line budget: the driver keeps only the LAST 2000 chars
        // of stdout, and the r9 final line (per-query p50/p95/p99/sp50/
        // tps at 20 queries) measured 2.4+ KB — truncated, parsed=None
        // in BENCH_r09.json. The official p50 already rides in the
        // final line's contract-required "queries" map (seconds), so
        // the compact stats carry ONLY the steady-state base; p95/p99/
        // tps/stragglers stay full-precision in this stats block line.
        compact(name) =
          f"""{"sp50":${steadyP50.getOrElse(name, pct(lat, 0.5)) * 1000}%.0f}"""
      } else {
        perQuery(name) = -1.0
        val err = runErrors.getOrElse(name, "unknown")
        stats(name) = s"""{"error":"$err"}"""
        compact(name) = s"""{"error":"$err"}"""
      }
      // Incremental evidence (r11 verdict #1c): each query's stats line
      // lands in stdout + the full file the moment it exists, so a
      // mid-run kill loses only the query in flight — the aggregate
      // stats/queries blocks below still carry the official copy.
      emit(s"""{"block":"headline_q","name":"$name",""" +
        s""""reduced":$tight,"stats":${stats(name)}}""")
      // Release operator-internal caches between queries (kept across the
      // iterations of one query — the warm path reuses them, as a resident
      // service would).
      CacheRegistry.releaseAll()
      }
    }
    if (headlineSkipped.nonEmpty) {
      skips("headline") = s"time_budget: ${headlineSkipped.size} queries " +
        s"untimed (${headlineSkipped.mkString(",")})"
      flatnessPass = false // a partial headline pass is not flat evidence
    }
    if (headlineReduced.nonEmpty)
      emit(s"""{"block":"headline_reduced","queries":${headlineReduced
        .map(q => s""""$q"""").mkString("[", ",", "]")},""" +
        s""""note":"timed in essentials mode (2 warm-ups, halved iters, no retime) under budget pressure"}""")

    // Cold single pass over the rest of the catalog — time-boxed: the
    // 200+-entry catalog is a wall hog under contention (r10 verdict
    // #1c); the loop stops at the reserve line and records how many it
    // skipped. On a CONTENDED machine the whole pass is DEFERRED to the
    // end of the run (after the essential blocks — it is the least
    // diagnostic evidence: single samples of non-headline queries on a
    // machine being stolen from), emitted as its own queries_cold block.
    def coldPass(reserveS: Double): Unit = if (only.isEmpty && blockOn("cold")) {
      val coldTimes = scala.collection.mutable.LinkedHashMap[String, Double]()
      var coldSkipped = 0
      SparkEntry.queries.keys.toSeq.sorted
        .filterNot(headline.contains)
        .foreach { n =>
          if (remainingS < reserveS || spark.sparkContext.isStopped)
            coldSkipped += 1
          else {
            val t = run(n); perQuery(n) = t; coldTimes(n) = t
            CacheRegistry.releaseAll()
          }
        }
      if (coldSkipped > 0)
        skips("cold") = s"time_budget: $coldSkipped catalog queries skipped"
      if (contended)
        emit(s"""{"block":"queries_cold","queries":${coldTimes.map {
          case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")},""" +
          s""""skipped_n":$coldSkipped}""")
    }
    if (!contended) coldPass(540)

    // S7: CSV result sink in the reference's column layout
    // (scenario, scale_up, depth, p50_ms, p95_ms, p99_ms, tps —
    // demo_did_graph/02_topology_dynamic/benchmark_scenario_a.py:141).
    sys.env.get("SPARK_GRAFT_CSV_OUT").foreach { path =>
      import spark.implicits._
      headline.filter(perQuery.contains).map { n =>
        val s = stats.getOrElse(n, "{}")
        def f(key: String): Double =
          s".*\"$key\":([-0-9.]+).*".r.findFirstMatchIn(s).map(_.group(1).toDouble).getOrElse(-1)
        (n, sfDir, 4, f("p50_ms"), f("p95_ms"), f("p99_ms"), f("tps"))
      }.toDF("scenario", "scale_up", "depth", "p50_ms", "p95_ms", "p99_ms", "tps")
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    }

    // ---- Evidence emission: full-precision block lines first, compact
    // ---- contract line LAST. Every line is also appended (and flushed)
    // ---- to BENCH_FULL.jsonl as it is produced, and blocks are computed
    // ---- cheapest/most-load-bearing first (cdc, dynamic, e2e) with the
    // ---- long multi-decade scale sweep at the end — if the harness kills
    // ---- a long run mid-sweep, the stdout tail and the file still hold
    // ---- everything but the bonus decade.
    val qs = perQuery.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val st = stats.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val errJson = runErrors.map { case (k, v) => s""""$k":"$v"""" }
      .mkString("{", ",", "}")
    val total = perQuery.values.filter(_ >= 0).sum
    emit(s"""{"block":"queries","queries":$qs,"errors":$errJson}""")
    emit(s"""{"block":"stats","iterations":$iters,"stats":$st}""")
    if (flatness.nonEmpty) {
      val fl = flatness.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      emit(s"""{"block":"flatness","per_query":$fl,"pass":$flatnessPass,""" +
        s""""rule":"p95<=2x p50 and first-half p50<=1.5x second-half; one retime allowed, both series committed"}""")
    }

    // Block gate: a block runs only if the remaining budget clears its
    // floor (a rough quiet-machine cost) plus the final-line reserve —
    // otherwise the evidence records an explicit skip. A stopped context
    // (driver kill mid-run) degrades the same way.
    def gate(name: String, floorS: Double)(body: => String): String =
      if (spark.sparkContext.isStopped) {
        skips(name) = "context_stopped"
        """{"skipped":"context_stopped"}"""
      } else if (remainingS < floorS + 60) {
        skips(name) = "time_budget"
        f"""{"skipped":"time_budget","floor_s":$floorS%.0f,"remaining_s":$remainingS%.0f}"""
      } else body
    def gate2(name: String, floorS: Double)(body: => (String, String))
        : (String, String) = {
      val g = gate(name, floorS)(null)
      if (g != null) (g, g) else body
    }

    var dynCompact = "{}"
    var e2eCompact = "{}"
    var scaleCompact = "{}"
    def runCdcBlock(): Unit = {
      val cdc = if (only.isEmpty && blockOn("cdc"))
        gate("cdc", 120)(cdcMetrics(spark, sfDir)) else "{}"
      emit(s"""{"block":"cdc","cdc":$cdc}""")
    }
    def runPreparedBlock(): Unit = {
      val prepared = if (only.isEmpty && blockOn("prepared"))
        gate("prepared", 60)(preparedMetrics(spark, sfDir, math.max(3, iters / 4)))
      else "{}"
      emit(s"""{"block":"prepared","prepared":$prepared}""")
    }
    def runDynamicBlock(): Unit = {
      val (dyn, dc) = if (only.isEmpty && blockOn("dynamic"))
        gate2("dynamic", 120)(dynamicMetrics(spark, sfDir, math.max(3, iters / 4)))
      else ("{}", "{}")
      dynCompact = dc
      emit(s"""{"block":"dynamic","dynamic":$dyn}""")
    }
    def runE2eBlock(): Unit = {
      val (e2e, ec) = if (only.isEmpty && blockOn("e2e"))
        gate2("e2e", 150)(e2eMetrics(spark, sfDir, contended))
      else ("{}", "{}")
      e2eCompact = ec
      emit(s"""{"block":"e2e","e2e":$e2e}""")
    }
    def runScaleBlock(dirsOverride: Option[Seq[String]], floorS: Double)
        : Unit = {
      val (scale, sc) = if (only.isEmpty && blockOn("scale"))
        gate2("scale", floorS)(scaleMetrics(spark, math.max(3, iters / 4),
          perQuery.toMap ++ steadyP50, sfDir, () => remainingS, dirsOverride))
      else ("{}", "{}")
      scaleCompact = sc
      emit(s"""{"block":"scale","scale":$scale}""")
    }

    def finalLine(scaleCompact: String, provisional: Boolean): String = {
      val cs = compact.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      val qsHead = perQuery.filter(kv => headline.contains(kv._1))
        .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
      // Tail-budget discipline: the r11 final line measured 1,903 bytes
      // against the driver's 2,000-char stdout tail, which ALSO has to
      // hold sbt's trailing "[success] ..." line (~70 bytes) — so the
      // optional flags print only when they carry information
      // (skipped_blocks when nonempty, provisional only on the
      // pre-sweep record). contended is always present (r10 verdict #3:
      // a sick record must be self-describing).
      val skipped = if (skips.isEmpty) ""
        else s""""skipped_blocks":${skips.keys.map(k => s""""$k"""")
          .mkString("[", ",", "]")},"""
      val prov = if (provisional) """"provisional":true,""" else ""
      f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qsHead,""" +
        s""""stats":$cs,"e2e":$e2eCompact,"dynamic":$dynCompact,""" +
        s""""scale_ratio_top":$scaleCompact,"iterations":$iters,"sf":"$sfDir",""" +
        s""""flatness_pass":$flatnessPass,"contended":$contended,""" +
        skipped + prov +
        s""""full":"${fullPath.split('/').last}"}"""
    }
    if (!contended) {
      // Quiet machine: the r9-r11 official order, held for
      // round-over-round comparability. The provisional contract line
      // lands BEFORE the long multi-decade sweep: if the harness kills
      // the run mid-sweep, the stdout tail still ends in a complete,
      // parseable record of everything measured so far (r10's official
      // record died exactly there).
      runCdcBlock()
      runPreparedBlock()
      runDynamicBlock()
      runE2eBlock()
      if (only.isEmpty && blockOn("scale"))
        emit(finalLine("{\"pending\":true}", provisional = true))
      runScaleBlock(None, 300)
    } else {
      // Contended machine: ESSENTIALS-FIRST (r11 verdict #1b) — blocks
      // in descending evidence-value-per-minute, so whatever the budget
      // (or a harness kill) cuts off is the least diagnostic part:
      //   1. scale CANARY — sf0.01 + sf0.1 only: two decades are enough
      //      for one adjacent-decade ratio per query, at a fraction of
      //      the 4-decade sweep (whose sf1 cells would be contaminated
      //      garbage here anyway);
      //   2. e2e (already runs halved batches when contended);
      //   3. cdc, prepared (cheap, load-bearing throughput numbers);
      //   4. dynamic LAST — its multi-second mutate cycles are the
      //      least meaningful numbers on a machine being stolen from
      //      (the r11 driver capture spent its tail producing 5-52 s
      //      contaminated churn cycles while e2e and scale starved).
      emit(s"""{"block":"block_order","order":"scale_canary,e2e,cdc,prepared,dynamic,cold","reason":"contended"}""")
      if (only.isEmpty && blockOn("scale"))
        emit(finalLine("{\"pending\":true}", provisional = true))
      // An EXPLICIT dirs request (forensic reruns) outranks the canary
      // default — the canary is for the driver's unattended run.
      runScaleBlock(
        if (sys.env.contains("SPARK_GRAFT_SCALE_DIRS")) None
        else Some(Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")),
        150)
      runE2eBlock()
      runCdcBlock()
      runPreparedBlock()
      runDynamicBlock()
      coldPass(120) // last: least diagnostic on a contended machine
    }
    if (skips.nonEmpty)
      emit(s"""{"block":"skips","skips":${skips.map { case (k, v) =>
        s""""$k":"$v"""" }.mkString("{", ",", "}")}}""")

    emit(finalLine(scaleCompact, provisional = false))
    } catch { case e: Throwable =>
      val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r\t]", " ")
        .take(200)
      // Through emit, not println (r11 ADVICE): the aborted record gets
      // its elapsed_s stamp and lands in the persisted full log too.
      emit(s"""{"metric":"total","value":-1,"unit":"sec","queries":{},""" +
        s""""error":"${e.getClass.getSimpleName}","message":"$msg",""" +
        s""""flatness_pass":false,"aborted":true}""")
    } finally {
      fullOutOpen = false
      fullOut.foreach(w => try w.close() catch { case _: Exception => () })
    }
    try { if (!spark.sparkContext.isStopped) spark.stop() }
    catch { case _: Throwable => () }
  }

  /** Prepared-statement surface timings — the reference's prepare-once /
    * bind-per-iteration protocol (05_abac/benchmark_scenario_b.py:264-299:
    * one parameterized recursive CTE, executed per binding in the loop).
    * Times each binding through the prepared handle (stable statement
    * text → session parse/plan cache) against a rebuild twin that
    * re-creates the view + statement object every iteration. Both paths
    * share the memoized edge checkpoint (materializeForRcte), so the
    * delta isolates STATEMENT preparation — view re-registration,
    * re-analysis, plan-cache miss — not data materialization; the
    * reference's psycopg re-prepare doesn't reload data either.
    */
  private def preparedMetrics(spark: SparkSession, sfDir: String,
      iters: Int): String = {
    import graft.queries.Prepared
    try {
      val bindings = Seq(("E0", 20, "E15"), ("E3", 5, "E8"), ("E0", 5, "E15"))
      val pq = Prepared.wotPathCount(spark, sfDir)
      def args(b: (String, Int, String)) =
        Map[String, Any]("client" -> b._1, "length" -> b._2, "anchor" -> b._3)
      bindings.foreach(b => pq.bind(args(b)).count()) // warm-up pass
      val rows = bindings.map { b =>
        // Interleaved so both variants see the same cache/JIT state —
        // separate loops hand whichever runs second a warmer session.
        val boundT = Array.newBuilder[Double]
        val rebuiltT = Array.newBuilder[Double]
        (1 to iters).foreach { _ =>
          val t0 = System.nanoTime()
          pq.bind(args(b)).count()
          boundT += (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          Prepared.wotPathCount(spark, sfDir).bind(args(b)).count()
          rebuiltT += (System.nanoTime() - t1) / 1e9
        }
        val bound = boundT.result().sorted
        val rebuilt = rebuiltT.result().sorted
        f"""{"client":"${b._1}","length":${b._2},"anchor":"${b._3}",""" +
          f""""bind_p50_ms":${pct(bound, 0.5) * 1000}%.1f,""" +
          f""""bind_p95_ms":${pct(bound, 0.95) * 1000}%.1f,""" +
          f""""rebuild_p50_ms":${pct(rebuilt, 0.5) * 1000}%.1f}"""
      }
      s"""{"iterations":$iters,"bindings":[${rows.mkString(",")}]}"""
    } catch {
      case e: Throwable => s"""{"error":"${e.getClass.getSimpleName}"}"""
    }
  }

  /** Scale-up sweep — the reference's scale_up protocol (fresh state per
    * scale step, demo_did_graph/03_equalization/benchmark_scenario_c.py:
    * 41-58; scale list 02_topology_dynamic/benchmark_scenario_a.py:110):
    * run the headline set at every test scale factor and report per-query
    * p50 plus the ratio between consecutive scales. The testdata steps are
    * 10× each, so a ~1 ratio means the plan is pruned/broadcast-bound
    * (scale-insensitive), ~10 means a full-scan-bound linear plan, and
    * anything super-linear is a red flag. This is the measured evidence
    * behind the 100×-design claims in the operator scaladocs.
    *
    * Decades: the three driver-provided sfs plus the generated sf1
    * ([[graft.scale.ScaleGen]], 10× sf0.1 — the reference's own 1M-node
    * scale, 02_topology_dynamic/benchmark_scenario_a.py:110) when present.
    * sf1 runs fewer iterations (p50-of-3) to bound sweep wall time.
    *
    * Caveat baked into the JSON: documents/embeddings are 500 rows at
    * sf0.001 AND sf0.01 in the driver testdata (5000/2000 at sf0.1), so
    * pipeline-query ratios across the LOWER decades track corpus size,
    * not sf. sf1 is a true 10× for them — ScaleGen replicates both
    * corpora into copy-disjoint blocks — so the sf1/sf0.1 ratio is the
    * honest scale signal for d2/ann/d5.
    *
    * Returns (full block JSON, compact top-boundary ratio JSON for the
    * final contract line).
    */
  private def scaleMetrics(spark: SparkSession, iters: Int,
      headlineP50Sec: Map[String, Double], mainSfDir: String,
      remainingS: () => Double = () => Double.MaxValue,
      dirsOverride: Option[Seq[String]] = None): (String, String) = {
    // benchdata/ is gitignored, so a fresh checkout loses the generated
    // decade; rebuild it in-session rather than silently shrinking the
    // sweep to three decades. LAZILY, though — just before the sf1 cells
    // run, never at sweep start: the ~10× write displaces the page cache
    // and grows the heap, and when it ran before the lower decades their
    // cells read flat-but-~1.5× over headline steady state (measured
    // r10: j5 559 vs 348 ms, j8 628 vs 370, q1 247 vs 155 — scan-bound
    // queries only; planner-bound r1/r5 got FASTER), failing the
    // self-check the contamination deserves but for the wrong decade.
    def regenSf1(): Unit =
      if (!new java.io.File(Sf1Dir).isDirectory &&
          new java.io.File("/root/testdata/sf0.1").isDirectory)
        try graft.scale.ScaleGen.generate(spark, "/root/testdata/sf0.1", Sf1Dir, 10)
        catch { case e: Throwable =>
          val m = String.valueOf(e.getMessage).replaceAll("[\"\\\\\n]", " ")
            .take(200)
          println(s"""{"block":"scale_gen","error":"${e.getClass.getSimpleName}","message":"$m"}""") }
    // dirsOverride is the contended-run CANARY (two decades, one
    // adjacent ratio per query) — it bypasses the env default, never
    // includes the regen-costly sf1 dir.
    val dirs = dirsOverride.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SCALE_DIRS",
        "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1," +
          Sf1Dir)
        .split(",").toSeq)
      .filter(d => new java.io.File(d).isDirectory ||
        (d == Sf1Dir && new java.io.File("/root/testdata/sf0.1").isDirectory))
    if (dirs.size < 2) return ("{}", "{}")
    def sfName(d: String) = d.split("/").last
    // Sweep-entry settling laps (r10, widened r12): the sweep starts
    // seconds after the e2e block's streaming machinery tears down, and
    // the residual drag decays over ~10-60 s — measured as a FLAT 2-3x
    // elevation across the whole FIRST decade only (r5 sf0.001 278 ms
    // vs sf0.01 126 ms; r12 first-run g3 5.6 s vs sf0.01 2.0 s, failing
    // the decade check exactly as intended) while later decades read
    // clean. The per-query adaptive warm-up cannot absorb a
    // machine-wide decay; untimed laps over the first dir can. Lap
    // until the lap time stabilizes (second lap within 1.3x of the
    // best so far), max 3 laps — one lap was measured insufficient
    // after the r12 cold-pass growth put more streaming start/stops
    // ahead of the sweep.
    dirs.headOption.filter(d => new java.io.File(d).isDirectory)
      .foreach { d0 =>
        def lap(): Double = {
          val t0 = System.nanoTime()
          headline.filter(SparkEntry.queries.contains).foreach { q =>
            try SparkEntry.queries(q)(spark, d0).count()
            catch { case _: Throwable => () }
            CacheRegistry.releaseAll()
          }
          (System.nanoTime() - t0) / 1e9
        }
        var prev = lap()
        var laps = 1
        var cur = lap(); laps += 1
        // Still improving by >30% per lap = still decaying; lap again
        // (cap 3 — two stable laps in a row is settled enough).
        while (laps < 3 && cur < prev / 1.3) {
          prev = cur
          cur = lap(); laps += 1
        }
        println(f"""{"block":"scale_settle","laps":$laps,"last_lap_s":$cur%.1f}""")
      }
    try {
      val p50 = scala.collection.mutable.LinkedHashMap[String,
        scala.collection.mutable.LinkedHashMap[String, Double]]()
      val cellDetail = scala.collection.mutable.LinkedHashMap[String,
        scala.collection.mutable.LinkedHashMap[String, String]]()
      // Per-decade budget floors (quiet-machine costs): a decade that no
      // longer fits the remaining wall is recorded as skipped, not run
      // into the driver's kill. sf1 carries its in-session regen cost.
      val decadeFloorS = Map("sf0.001" -> 60.0, "sf0.01" -> 90.0,
        "sf0.1" -> 240.0, "sf1" -> 600.0)
      val skippedDecades = scala.collection.mutable.ArrayBuffer[String]()
      dirs.foreach { d =>
        if (remainingS() < decadeFloorS.getOrElse(sfName(d), 120.0) + 60 ||
            spark.sparkContext.isStopped) {
          skippedDecades += sfName(d)
        } else {
        if (d == Sf1Dir) regenSf1()
        if (new java.io.File(d).isDirectory) {
        val dirIters = if (sfName(d) == "sf1") math.min(3, iters) else iters
        headline.filter(SparkEntry.queries.contains).foreach { q =>
          def run(): Double = {
            val t0 = System.nanoTime()
            try SparkEntry.queries(q)(spark, d).count()
            catch { case _: Throwable => return -1.0 }
            (System.nanoTime() - t0) / 1e9
          }
          // Warm-up parity with the headline protocol: minimum two
          // untimed runs (the r8 sweep's one-warm-up cells reported
          // sub-1.0 decade ratios — per-decade cold state dominating
          // 5-iteration medians), extended adaptively until the last
          // three warm-ups sit in a 1.4x band (cap 6) — the r9 sweep's
          // sf0.01/sf0.001 cells were still cold-contaminated (u1 sf0.01
          // read 31.5 s vs sf0.1's 2.4 s) because two warm-ups don't
          // outlast machine-state churn from the preceding decades.
          val w = scala.collection.mutable.ArrayBuffer[Double]()
          w += run(); w += run()
          while (w.length < 6 && {
            val t = w.takeRight(3)
            t.length < 3 || t.exists(_ < 0) || t.max > 1.4 * t.min
          }) w += run()
          val cells = (1 to dirIters)
            .map(_ => timedIter(spark, () => run())).filter(_.sec >= 0).toArray
          val lat = cells.map(_.sec).sorted
          if (lat.nonEmpty) {
            p50.getOrElseUpdate(q,
              scala.collection.mutable.LinkedHashMap())(sfName(d)) =
              pct(lat, 0.5) * 1000
            cellDetail.getOrElseUpdate(q,
              scala.collection.mutable.LinkedHashMap())(sfName(d)) =
              cells.map(c => f"${c.sec * 1000}%.1f").mkString("[", ",", "]") +
                s""","gc_ms":${cells.map(_.gcMs).sum}"""
          }
          CacheRegistry.releaseAll()
        }
        }
        }
      }
      // Hot-cell retime (the r11/r12 forensic made structural): every
      // round so far, one or two CPU-heavy top-decade cells read 2x
      // their committed band late in the run and an ISOLATED fresh-JVM
      // rerun refuted them (r12 close: d25 12.9 s -> 5.4 s, d4 9.2 s ->
      // 4.2 s after ~19 min + a 240-query cold pass) — late-run JVM/GC
      // churn, not plans. Automate the refutation in-run: a top-decade
      // cell whose ratio over the previous decade exceeds 12x (and 1 s
      // absolute) gets one System.gc() pause + 1 warm-up + 3 fresh
      // samples; the retimed median becomes the reported cell and the
      // ORIGINAL series stays committed beside it (the flatness-retime
      // discipline: both series on the record, nothing silently
      // replaced).
      if (dirs.size >= 2) {
        val topDirs = dirs.takeRight(2)
        val (loSf, hiSf) = (sfName(topDirs(0)), sfName(topDirs(1)))
        val hiDir = topDirs(1)
        val outliers = p50.toSeq.collect { case (q, bySf)
          if bySf.get(loSf).zip(bySf.get(hiSf)).exists { case (l, h) =>
            l > 0 && h / l > 12.0 && h - l > 1000 } => q }
        val retimed = scala.collection.mutable.ArrayBuffer[String]()
        outliers.foreach { q =>
          if (remainingS() > 120 && !spark.sparkContext.isStopped) {
            System.gc(); Thread.sleep(500)
            def runQ(): Double = {
              val t0 = System.nanoTime()
              try SparkEntry.queries(q)(spark, hiDir).count()
              catch { case _: Throwable => return -1.0 }
              finally CacheRegistry.releaseAll()
              (System.nanoTime() - t0) / 1e9
            }
            runQ() // one warm-up after the gc pause
            val cells = (1 to 3).map(_ => runQ()).filter(_ >= 0).sorted
            if (cells.nonEmpty) {
              val reMs = cells(cells.length / 2) * 1000
              cellDetail(q)(hiSf) = cellDetail(q)(hiSf) +
                f""","retime_after_gc_ms":${cells.map(c =>
                  f"${c * 1000}%.1f").mkString("[", ",", "]")},""" +
                f""""original_p50_ms":${p50(q)(hiSf)}%.1f"""
              p50(q)(hiSf) = reMs
              retimed += q
            }
          }
        }
        if (retimed.nonEmpty)
          println(s"""{"block":"scale_retime","decade":"$hiSf",""" +
            s""""queries":${retimed.map(q => s""""$q"""")
              .mkString("[", ",", "]")},""" +
            s""""rule":"ratio>12x and gap>1s vs $loSf: gc pause + 1 warm-up + 3 fresh samples; original series kept in detail"}""")
      }
      val p50Json = p50.map { case (q, bySf) =>
        s""""$q":${bySf.map { case (sf, ms) => f""""$sf":$ms%.2f""" }
          .mkString("{", ",", "}")}"""
      }.mkString("{", ",", "}")
      val detailJson = cellDetail.map { case (q, bySf) =>
        s""""$q":${bySf.map { case (sf, d) =>
          s""""$sf":{"samples_ms":$d}""" }.mkString("{", ",", "}")}"""
      }.mkString("{", ",", "}")
      // Self-check: the sweep's cell at the bench's own sfDir must
      // reproduce the headline stats block (same data, same protocol) —
      // when it does not, the sweep's OTHER cells cannot be trusted
      // either, and the block says so itself instead of leaving the
      // contradiction for a reader to find.
      val mainSf = sfName(mainSfDir)
      val self = p50.flatMap { case (q, bySf) =>
        for (sweepMs <- bySf.get(mainSf); headSec <- headlineP50Sec.get(q)
             if headSec > 0)
          yield q -> sweepMs / (headSec * 1000)
      }
      val selfJson = if (self.isEmpty) "{}" else {
        val worst = self.maxBy { case (_, r) => math.max(r, 1.0 / r) }
        // The check exists to catch a COLD sweep: per-decade cold state
        // inflating cells and fabricating sub-linear decade ratios (the
        // r8 defect). That failure mode is the ratio > 1.5 direction
        // ONLY. The opposite direction — sweep cells FASTER than the
        // headline steady state — recurs for the sub-200 ms queries
        // (r1 trajectory across official runs: 0.73, 0.69, 0.66) because
        // the sweep runs last, after hundreds of intervening plans have
        // C2-compiled the driver's analysis/optimization paths; planning
        // is a fixed ~50 ms of those queries' headline latency. All
        // sweep cells share that maximal warmth, so intra-sweep decade
        // ratios stay comparable — it cannot fabricate sub-linearity.
        // Report the warmer-than-headline queries by name instead of
        // failing the block on JVM maturity — but keep a loose lower
        // band: a sweep cell under 1/3 of the headline steady state is
        // not maturity, it is a headline/sweep contradiction (one of the
        // two numbers is wrong), and the block must fail rather than
        // file it under footnotes.
        val cold = self.filter { case (_, r) => r > 1.5 }
        val warmer = self.filter { case (_, r) => r < 1.0 / 1.5 }
        val gross = self.filter { case (_, r) => r < 1.0 / 3.0 }
        val pass = cold.isEmpty && gross.isEmpty
        s"""{"dir":"$mainSf","headline_basis":"steady_state_last_half",""" +
          s""""sweep_over_headline":${self.map { case (q, r) =>
          f""""$q":$r%.2f""" }.mkString("{", ",", "}")},""" +
          f""""worst":"${worst._1}","worst_ratio":${worst._2}%.2f,""" +
          s""""sweep_warmer_than_headline":${warmer.keys
          .map(q => s""""$q"""").mkString("[", ",", "]")},""" +
          s""""gross_contradiction":${gross.keys
          .map(q => s""""$q"""").mkString("[", ",", "]")},""" +
          s""""pass":$pass}"""
      }
      // Decade plausibility (r9 "what's wrong" #3): a cell where 10x
      // LESS data runs >1.5x SLOWER than the next decade up is not scale
      // evidence, it is residual cold state (r9 canary: u1 sf0.01 at
      // 31.5 s vs sf0.1 at 2.4 s) — checked for EVERY adjacent decade
      // pair, so the lower decades are held to the same standard as the
      // sf0.1 cell instead of being committed unreadable.
      // The 150 ms absolute-gap floor keeps fixed-overhead jitter out:
      // a 135 ms cell "1.8x slower" than a 73 ms cell is two closure
      // tiers' probe overhead (r3 driver-BFS vs distributed artifact),
      // not contamination — while the real canary class (u1 sf0.01 at
      // 31.5 s vs 2.4 s) trips the check by 29 seconds.
      val implausible = p50.toSeq.flatMap { case (q, bySf) =>
        dirs.map(sfName).sliding(2).flatMap {
          case Seq(lo, hi) =>
            for (l <- bySf.get(lo); h <- bySf.get(hi)
                 if l > 1.5 * h && l - h > 150)
              yield f"""{"query":"$q","lo":"$lo","lo_ms":$l%.1f,""" +
                f""""hi":"$hi","hi_ms":$h%.1f}"""
          case _ => None
        }
      }
      val decadeJson =
        s"""{"implausible":${implausible.mkString("[", ",", "]")},""" +
          s""""pass":${implausible.isEmpty},""" +
          s""""rule":"p50 at 10x less data must not exceed 1.5x the next decade up (150 ms absolute-gap floor)"}"""
      def ratioOf(lo: String, hi: String): String =
        p50.flatMap { case (q, bySf) =>
          for (l <- bySf.get(sfName(lo)); h <- bySf.get(sfName(hi)) if l > 0)
            yield f""""$q":${h / l}%.2f"""
        }.mkString("{", ",", "}")
      val ratioJson = dirs.sliding(2).map { case Seq(lo, hi) =>
        s""""${sfName(hi)}_over_${sfName(lo)}":${ratioOf(lo, hi)}"""
      }.mkString(",")
      val full =
        s"""{"iterations":$iters,"dirs":${dirs.map(d => s""""${sfName(d)}"""")
          .mkString("[", ",", "]")},"skipped_decades":${skippedDecades
          .map(d => s""""$d"""").mkString("[", ",", "]")},""" +
          s""""p50_ms":$p50Json,"ratio":{$ratioJson},""" +
          s""""selfcheck":$selfJson,"decade_check":$decadeJson,""" +
          s""""detail":$detailJson,""" +
          s""""note":"documents/embeddings are 500 rows at both sf0.001 and sf0.01 (5000/2000 at sf0.1), so pipeline ratios across the lower decades track corpus size, not sf; sf1 replicates both corpora 10x into copy-disjoint blocks, so sf1/sf0.1 is the honest pipeline scale ratio"}"""
      val top = dirs.takeRight(2)
      // Tail-budget form: worst top-decade ratio + catalog count only;
      // the per-query ratio map lives in this block's full line above.
      val topRatios = p50.flatMap { case (q, bySf) =>
        for (l <- bySf.get(sfName(top(0))); h <- bySf.get(sfName(top(1)))
          if l > 0) yield q -> h / l
      }
      val compactRatio =
        if (topRatios.isEmpty) "{}"
        else {
          val (wq, wr) = topRatios.maxBy(_._2)
          f"""{"top":"${sfName(top(1))}_over_${sfName(top(0))}",""" +
            f""""worst":"$wq","ratio":$wr%.2f,"n":${topRatios.size}}"""
        }
      (full, compactRatio)
    } catch { case e: Throwable =>
      // A swallowed class name made the r9 scale failure undiagnosable
      // from the evidence alone; record message + top frames.
      val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\n]", " ")
        .take(300)
      val frames = e.getStackTrace.take(6)
        .map(f => s"${f.getClassName}.${f.getMethodName}:${f.getLineNumber}")
        .mkString(" < ")
      val err = s"""{"error":"${e.getClass.getSimpleName}",""" +
        s""""message":"$msg","at":"$frames"}"""
      (err, err) }
  }

  /** E2E 3-segment latency + process resource envelope, mirroring the
    * reference's Kafka pipeline benchmark (demo_sqlite_cdc/02_benchmark/
    * 02_e2e_cdc.py:44-64,126-141: capture→broker, broker→apply, end-to-end
    * with count/avg/min/max/stddev/p50/p95/p99 each) and its 1 Hz CPU/RSS
    * monitor thread (01_local_cdc_capture.py:20-26,138-145).
    *
    * The broker hop is synthesized: envelopes are staged to files stamped
    * with the capture time, the stream stamps `broker_ts_ms` when a
    * micro-batch is read, and [[graft.streaming.CdcStream.latencySegments]]
    * stamps apply time after the snapshot merge. Per-event latencies are
    * written as parquet by each micro-batch (never collected) and
    * summarized with one distributed aggregation.
    *
    * Returns (full block JSON, compact segment-p50/p95 JSON for the final
    * contract line).
    */
  private[graft] def e2eMetrics(spark: SparkSession, sfDir: String,
      contended: Boolean = false): (String, String) = {
    import org.apache.spark.sql.functions._
    import graft.streaming.CdcStream
    val dir = new java.io.File(s"target/bench_e2e_${System.nanoTime()}")
    val latDir = new java.io.File(dir, "lat")
    // 1 Hz resource sampler (reference MONITOR_FREQ = 1.0).
    val samples = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
    val stealSamples = scala.collection.mutable.ArrayBuffer[Double]()
    @volatile var stopSampling = false
    val sampler = new Thread(() => {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      // Steal rides along at 1 Hz: the e2e latency percentiles were the
      // OTHER surface the r12/r13 contended driver captures inflated
      // (p95 1749 vs official 1035 ms), and steal is the mechanism the
      // guest cannot otherwise see (r14 forensics).
      var lastSteal = stealSample()
      while (!stopSampling) {
        val cpu = math.max(0.0, os.getProcessCpuLoad * 100)
        val nowSteal = stealSample()
        val stealPct =
          if (lastSteal._1 < 0 || nowSteal._1 < 0 ||
            nowSteal._2 <= lastSteal._2) -1.0
          else 100.0 * (nowSteal._1 - lastSteal._1) /
            (nowSteal._2 - lastSteal._2)
        lastSteal = nowSteal
        val rssMb = try {
          val src = scala.io.Source.fromFile("/proc/self/status")
          try src.getLines().find(_.startsWith("VmRSS"))
            .map(_.split("\\s+")(1).toDouble / 1024)
            .getOrElse(Runtime.getRuntime.totalMemory / 1048576.0)
          finally src.close()
        } catch { case _: Exception =>
          Runtime.getRuntime.totalMemory / 1048576.0 }
        samples.synchronized { samples += ((cpu, rssMb)) }
        stealSamples.synchronized { stealSamples += stealPct }
        Thread.sleep(1000)
      }
    })
    sampler.setDaemon(true)
    try {
      // The watched directory starts empty; each micro-batch's envelopes
      // are produced with a fresh capture stamp just before their file is
      // moved in (the reference produces events progressively, not as one
      // pre-staged burst), so capture→broker measures produce→discover→
      // read latency per batch rather than cumulative backlog wait.
      // rename(2) is atomic on one filesystem — the source never sees a
      // partial file.
      val watch = new java.io.File(dir, "in")
      watch.mkdirs()
      // Registry-owned cache: released in the finally below, so a throw
      // anywhere past this line cannot leak the cached events table.
      val events = CacheRegistry.register(
        graft.Tables.events(spark, sfDir).cache())
      // 20 batch clocks: segment latencies take ~20 distinct values, so
      // p95 separates from max (the r7 5-batch staging left p95==max —
      // flagged as a resolution artifact, fixed by resolution). Under a
      // contended sandbox the block halves to 10 batches — it is one of
      // the two wall hogs the r10 budget post-mortem named.
      val nBatches = if (contended) 10 else 20

      sampler.start()
      val cfg = graft.GraftConfig(cdcSource = "file",
        cdcSourcePath = watch.getPath,
        cdcMaxFilesPerTrigger = 1)
      val state = new CdcStream.SnapshotHandle(spark)
      // Broker stamp rides alongside the parsed columns (parse projects the
      // envelope fields only, so stamp after it — same micro-batch clock).
      val parsed = CdcStream.parse(CdcStream.source(spark, cfg))
        .withColumn("broker_ts_ms", unix_millis(current_timestamp()))
      val q = parsed.writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          state.set(CdcStream.mergeCdcBatch(state.get(batch.sparkSession), batch))
          // Apply stamp evaluates when this write runs — after the merge.
          CdcStream.latencySegments(batch)
            .select("lat_capture_to_broker", "lat_broker_to_apply", "lat_e2e")
            .write.mode("append").parquet(latDir.getPath)
        }.start()
      // Feed the live stream batch by batch: produce batch i's envelopes
      // (capture-stamped now), move its part files in, drain.
      (0 until nBatches).foreach { i =>
        val stage = new java.io.File(dir, s"stage$i")
        events.filter(col("event_id") % nBatches === i)
          .select(graft.functions.Debezium.envelope(
            graft.functions.Debezium.nullRow,
            struct(col("event_id").as("id"),
              concat(lit("u"), col("user_id").cast("string")).as("name")),
            lit("c"), unix_millis(current_timestamp()), "users").as("value"))
          .coalesce(1)
          .write.mode("overwrite").text(stage.getPath)
        Option(stage.listFiles).getOrElse(Array.empty)
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))
          .foreach { f =>
            if (!f.renameTo(new java.io.File(watch, s"b$i-${f.getName}")))
              throw new java.io.IOException(s"rename failed: ${f.getName}")
          }
        q.processAllAvailable()
      }
      q.stop()
      stopSampling = true
      sampler.join(2000)

      val segs = Seq("lat_capture_to_broker" -> "capture_to_broker",
        "lat_broker_to_apply" -> "broker_to_apply", "lat_e2e" -> "end_to_end")
      val aggCols = segs.flatMap { case (c, _) => Seq(
        count(col(c)).cast("double"), avg(col(c)).cast("double"),
        min(col(c)).cast("double"), max(col(c)).cast("double"),
        coalesce(stddev(col(c)), lit(0.0)),
        percentile(col(c), lit(0.5)).cast("double"),
        percentile(col(c), lit(0.95)).cast("double"),
        percentile(col(c), lit(0.99)).cast("double")) }
      val r = spark.read.parquet(latDir.getPath)
        .agg(aggCols.head, aggCols.tail: _*).head()
      val segJson = segs.zipWithIndex.map { case ((_, name), i) =>
        val o = i * 8
        f""""$name":{"count":${r.getDouble(o).toLong},""" +
          f""""avg_ms":${r.getDouble(o + 1)}%.2f,"min_ms":${r.getDouble(o + 2)}%.1f,""" +
          f""""max_ms":${r.getDouble(o + 3)}%.1f,"stddev_ms":${r.getDouble(o + 4)}%.2f,""" +
          f""""p50_ms":${r.getDouble(o + 5)}%.1f,"p95_ms":${r.getDouble(o + 6)}%.1f,""" +
          f""""p99_ms":${r.getDouble(o + 7)}%.1f}"""
      }.mkString(",")
      val snap = samples.synchronized(samples.toArray)
      val cpus = snap.map(_._1).sorted
      val mems = snap.map(_._2).sorted
      def mean(a: Array[Double]) = if (a.isEmpty) 0.0 else a.sum / a.length
      // RSS composition + cap (r10 verdict #4): the driver's r10 capture
      // read 79 GB average RSS against 9.2 GB in the committed run of the
      // same code — with the bench JVM forked at -Xmx8g, such a resident
      // set cannot be heap; the suspects are file-backed mappings (mmap'd
      // shuffle/parquet under page-cache pressure) vs anonymous native
      // (malloc-arena bloat, direct buffers). smaps_rollup splits the two
      // IN the evidence, and a configurable cap turns a silent near-OOM
      // into a loud alert — without failing the run (rc 0 is the
      // contract; the alert is the evidence).
      val (anonMb, fileMb) = try {
        val src = scala.io.Source.fromFile("/proc/self/smaps_rollup")
        try {
          val m = src.getLines().flatMap { l =>
            val p = l.split("\\s+")
            if (p.length >= 2 && (l.startsWith("Anonymous:") ||
              l.startsWith("Shared_Clean:") || l.startsWith("Private_Clean:")))
              Some(p(0).dropRight(1) -> p(1).toDouble / 1024) else None
          }.toMap
          (m.getOrElse("Anonymous", -1.0),
            m.getOrElse("Shared_Clean", 0.0) + m.getOrElse("Private_Clean", 0.0))
        } finally src.close()
      } catch { case _: Exception => (-1.0, -1.0) }
      val rssMax = if (mems.isEmpty) 0.0 else mems.last
      val rssCapMb = sys.env.getOrElse("SPARK_GRAFT_RSS_CAP_MB", "24576").toDouble
      val rssAlert = rssMax > rssCapMb
      val stealArr = stealSamples.synchronized {
        stealSamples.filter(_ >= 0).toArray
      }
      val stealAvg = if (stealArr.isEmpty) -1.0
        else stealArr.sum / stealArr.length
      val stealMax = if (stealArr.isEmpty) -1.0 else stealArr.max
      val res =
        f""""resource":{"samples":${snap.length},""" +
          f""""cpu_avg_pct":${mean(cpus)}%.1f,"cpu_max_pct":${if (cpus.isEmpty) 0.0 else cpus.last}%.1f,""" +
          f""""cpu_p95_pct":${pct(cpus, 0.95)}%.1f,""" +
          f""""rss_avg_mb":${mean(mems)}%.1f,"rss_max_mb":$rssMax%.1f,""" +
          f""""rss_p95_mb":${pct(mems, 0.95)}%.1f,""" +
          f""""rss_anon_mb":$anonMb%.1f,"rss_file_mapped_mb":$fileMb%.1f,""" +
          f""""heap_max_mb":${Runtime.getRuntime.maxMemory / 1048576}%d,""" +
          f""""rss_cap_mb":$rssCapMb%.0f,"rss_alert":$rssAlert,""" +
          f""""steal_pct_avg":$stealAvg%.1f,"steal_pct_max":$stealMax%.1f}"""
      // Compact form for the tail-capped final line: per-segment arrays in
      // the order capture_to_broker, broker_to_apply, end_to_end.
      def arr(off: Int): String =
        segs.indices.map(i => f"${r.getDouble(i * 8 + off)}%.1f").mkString("[", ",", "]")
      val compactJson =
        f"""{"n":${r.getDouble(0).toLong},"segs":"cap2brk,brk2apply,e2e",""" +
          s""""p50_ms":${arr(5)},"p95_ms":${arr(6)},""" +
          f""""cpu_avg_pct":${mean(cpus)}%.1f,"rss_max_mb":${if (mems.isEmpty) 0.0 else mems.last}%.0f}"""
      // The capture/broker/apply stamps are per-micro-batch clocks
      // (current_timestamp folds to one value per batch), so each segment
      // takes ~nBatches distinct values and p95==max is expected, not a
      // measurement bug.
      val note =
        s""""note":"stamps are per-micro-batch clocks ($nBatches batches); """ +
          """segments take ~nBatches distinct values, p95==max expected""""
      (s"{$segJson,$res,$note}", compactJson)
    } catch { case e: Throwable =>
      val cause = Option(e.getCause).map(_.getClass.getSimpleName).getOrElse("")
      val err = s"""{"error":"${e.getClass.getSimpleName}","cause":"$cause"}"""
      (err, err)
    } finally {
      stopSampling = true
      CacheRegistry.releaseAll()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }

  /** Dynamic-topology scenario block matching the reference's interleaved
    * mutate→query protocol (demo_did_graph/02_topology_dynamic/
    * benchmark_scenario_a.py:25-45): per turn-taking step, apply the step's
    * delegation rewrite, materialize the snapshot (the reference's
    * committed table state), then time the depth-bounded chain query —
    * p50/p95/p99/tps per depth, exactly the reference's per-row CSV output.
    *
    * The chain-churn and rewire cycles are timed as p50-of-3 with one
    * untimed warm-up cycle each (caches released between cycles, so every
    * timed cycle pays the full mutate+materialize+query cost): single-shot
    * cycle timings drew a ~16 s first-materialization/GC outlier onto a
    * different scenario in consecutive rounds (r5 chain_churn, r6 rewire)
    * with identical code — the median over warmed cycles is the evidence
    * that separates harness noise from a plan regression.
    *
    * Returns (full block JSON, compact cycle-p50 JSON for the final
    * contract line).
    */
  private def dynamicMetrics(spark: SparkSession, sfDir: String,
      iters: Int): (String, String) = {
    import graft.scenario.DynamicReplay
    try {
      var delegation = DynamicReplay.baseDelegation(spark, sfDir)
      val perDepth = Seq(4, 8, 12, 16).zipWithIndex.map { case (depth, i) =>
        delegation = CacheRegistry.register(
          DynamicReplay.mutateStep(delegation, i + 1).cache())
        delegation.count() // materialize post-mutation state
        def run(): Double = {
          val t0 = System.nanoTime()
          DynamicReplay.chainCount(spark, delegation, depth).count()
          (System.nanoTime() - t0) / 1e9
        }
        run() // warm-up
        val lat = (1 to iters).map(_ => run()).toArray.sorted
        f""""d$depth":{"p50_ms":${pct(lat, 0.5) * 1000}%.2f,""" +
          f""""p95_ms":${pct(lat, 0.95) * 1000}%.2f,""" +
          f""""p99_ms":${pct(lat, 0.99) * 1000}%.2f,""" +
          f""""tps":${lat.length / lat.sum}%.3f}"""
      }
      CacheRegistry.releaseAll()

      // One untimed warm-up cycle, then n timed cycles; caches are dropped
      // between cycles so each timed cycle is the full scenario.
      def cycles(body: () => Unit, n: Int): Array[Double] = {
        body(); CacheRegistry.releaseAll()
        (1 to n).map { _ =>
          val t0 = System.nanoTime()
          body()
          val dt = (System.nanoTime() - t0) / 1e9
          CacheRegistry.releaseAll()
          dt
        }.toArray.sorted
      }
      val nCycles = 3
      val churn = cycles(
        () => { graft.queries.ScenarioQueries.dynChainChurn(spark, sfDir).count(): Unit },
        nCycles)
      val rewire = cycles(
        () => { graft.queries.ScenarioQueries.dynRewire(spark, sfDir).count(): Unit },
        nCycles)
      def cycleJson(lat: Array[Double], steps: Int): String =
        f"""{"cycle_sec_p50":${pct(lat, 0.5)}%.3f,"cycle_sec_min":${lat.head}%.3f,""" +
          f""""cycle_sec_max":${lat.last}%.3f,"cycles":${lat.length},""" +
          f""""steps_per_sec":${steps / pct(lat, 0.5)}%.3f}"""
      val full =
        s"""{"turn_taking":${perDepth.mkString("{", ",", "}")},""" +
          s""""chain_churn":${cycleJson(churn, DynamicReplay.DefaultCycle.length)},""" +
          s""""rewire":${cycleJson(rewire, DynamicReplay.DefaultDepths.length)}}"""
      val compactJson =
        f"""{"churn_p50_s":${pct(churn, 0.5)}%.2f,"rewire_p50_s":${pct(rewire, 0.5)}%.2f,"cycles":$nCycles}"""
      (full, compactJson)
    } catch { case e: Throwable =>
      CacheRegistry.releaseAll()
      val err = s"""{"error":"${e.getClass.getSimpleName}"}"""
      (err, err)
    }
  }

  /** CDC-side metrics matching the reference harness (BASELINE.md):
    * apply throughput (ops/s) through the real micro-batch pipeline,
    * inter-event gap percentiles from the ordered log, and recovery
    * replay rate over the full backlog
    * (reference: demo_sqlite_cdc/02_benchmark/01_local_cdc_capture.py:119-135,
    * 03_recovery.py:106-117).
    *
    * The envelope backlog is staged as text files (the reference's offline
    * buffer file) written distributed — nothing collects to the driver at
    * any sf — and replayed through the engine's `cdc_source:"file"` branch
    * with `maxFilesPerTrigger=1`, so the apply path is the same
    * readStream→parse→foreachBatch-merge pipeline production would run.
    * Recovery re-reads the same files as a batch: sharded replay batching
    * (no single-partition window) + full keyed merge.
    */
  private def cdcMetrics(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions._
    import graft.streaming.CdcStream
    val microBatches = 5
    val dir = new java.io.File(s"target/bench_cdc_${System.nanoTime()}")
    try {
      val events = graft.Tables.events(spark, sfDir)
      val nEvents = events.count()
      // Stage the envelope backlog: one file per intended micro-batch.
      events.select(graft.functions.Debezium.envelope(
        graft.functions.Debezium.nullRow,
        struct(col("event_id").as("id"),
          concat(lit("u"), col("user_id").cast("string")).as("name")),
        lit("c"), unix_millis(col("ts")), "users").as("value"))
        .repartition(microBatches)
        .write.mode("overwrite").text(dir.getPath)
      // Report what actually landed on disk, not the intent: with
      // maxFilesPerTrigger=1, staged part files ARE the micro-batches.
      val stagedFiles = Option(dir.listFiles).getOrElse(Array.empty)
        .count(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))

      // Apply throughput through the real file-source streaming pipeline.
      val cfg = graft.GraftConfig(cdcSource = "file",
        cdcSourcePath = dir.getPath, cdcMaxFilesPerTrigger = 1)
      val state = new CdcStream.SnapshotHandle(spark)
      val q = CdcStream.start(
        CdcStream.parse(CdcStream.source(spark, cfg)), state)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val applySec = (System.nanoTime() - t0) / 1e9
      q.stop()

      // Gap stats, two distinct semantics (the reference's inter-event
      // latency — 01_local_cdc_capture.py:111-135 — is adjacent CAPTURE
      // timestamp gaps in cdc_log, stamped by the trigger during the live
      // run, i.e. engine cadence in ms):
      //  - event_gap_ms: adjacent gaps of the synthetic events' own ts
      //    column — the generator's DATA-DOMAIN cadence (seconds-scale at
      //    sf0.1). Kept for the lag-window shape, labeled for what it is.
      //  - capture_gap_ms: adjacent gaps of real wall-clock stamps
      //    assigned per row as the engine's capture path processes the
      //    backlog — the reference's protocol. Stamps are written
      //    distributed to a parquet side log and diffed with the same
      //    ordered-window query shape; nothing collects to the driver.
      val gaps = graft.queries.RelQueries.o3LagGaps(spark, sfDir)
      val g = gaps.agg(
        percentile(col("gap_ms"), lit(0.5)).as("p50"),
        percentile(col("gap_ms"), lit(0.95)).as("p95"),
        percentile(col("gap_ms"), lit(0.99)).as("p99")).head()

      val stampDir = new java.io.File(dir, "capture_log")
      // µs-resolution monotonic stamps: at local[32] the per-row capture
      // cadence is well under 1 ms, so wall-clock ms stamps quantized
      // every gap percentile to 0.0 (an r8 evidence-resolution defect,
      // not a measurement one). nanoTime is comparable within the single
      // JVM that stamps every row here; a multi-machine capture path
      // would need per-host clocks and ms resolution again.
      val stampUs = udf(() => System.nanoTime() / 1000L).asNondeterministic()
      val cq = CdcStream.parse(CdcStream.source(spark, cfg))
        .withColumn("capture_us", stampUs())
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(col("id"), col("capture_us"))
            .write.mode("append").parquet(stampDir.getPath)
        }.start()
      cq.processAllAvailable()
      cq.stop()
      val capLog = spark.read.parquet(stampDir.getPath)
      val cw = org.apache.spark.sql.expressions.Window
        .orderBy(col("capture_us"), col("id"))
      val cg = capLog
        .withColumn("prev_us", lag(col("capture_us"), 1).over(cw))
        .filter(col("prev_us").isNotNull)
        .select(((col("capture_us") - col("prev_us")) / 1000.0).as("gap_ms"))
        .agg(percentile(col("gap_ms"), lit(0.5)).as("p50"),
          percentile(col("gap_ms"), lit(0.95)).as("p95"),
          percentile(col("gap_ms"), lit(0.99)).as("p99"),
          max(col("gap_ms")).cast("double").as("max")).head()

      // Recovery: ordered replay batching (sharded — arithmetic batch keys,
      // no one-task window) + full re-apply of the backlog from the files.
      val t1 = System.nanoTime()
      val backlog = CdcStream.parse(spark.read.text(dir.getPath))
      val batches = CdcStream.replayStatsSharded(
        backlog.select(col("id")), 500).count()
      val replayed = CdcStream.mergeCdcBatch(
        state.snapshot.limit(0), backlog).count()
      val recoverSec = (System.nanoTime() - t1) / 1e9

      // At-least-once redelivery: the reference's offline recovery re-sends
      // buffered rows (demo_sqlite_cdc/02_benchmark/03_recovery.py:63-89),
      // so a replayed segment arrives twice. Copy one staged micro-batch
      // file back in as a duplicate segment and replay the whole backlog
      // through the stateful keyed dedup — emitted rows must shrink back
      // to the original event count (every redelivered duplicate dropped
      // by the per-key high-water state).
      val firstPart = Option(dir.listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith(".")).sortBy(_.getName).headOption
      val dedupJson = firstPart.map { part =>
        val dupRows = spark.read.text(part.getPath).count()
        java.nio.file.Files.copy(part.toPath,
          new java.io.File(dir, s"resend-${part.getName}").toPath)
        val counter = spark.sparkContext.longAccumulator("dedup_emitted")
        val t2 = System.nanoTime()
        val dq = CdcStream.statefulDedup(
            CdcStream.parse(CdcStream.source(spark, cfg)))
          .writeStream.outputMode("append")
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[(String, Long, Long, String)],
             _: Long) => counter.add(b.count())
          }.start()
        dq.processAllAvailable()
        dq.stop()
        val dedupSec = (System.nanoTime() - t2) / 1e9
        val input = nEvents + dupRows
        f""""dedup_replay":{"input":$input,"redelivered":$dupRows,""" +
          f""""emitted":${counter.value},"dropped":${input - counter.value},""" +
          f""""ev_per_sec":${input / dedupSec}%.1f},"""
      }.getOrElse("")

      f"""{"apply_ops_per_sec":${nEvents / applySec}%.1f,""" +
        f""""events":$nEvents,"micro_batches":$stagedFiles,""" +
        f""""event_gap_ms":{"semantics":"synthetic data-domain ts cadence","p50":${g.getDouble(0)}%.1f,"p95":${g.getDouble(1)}%.1f,"p99":${g.getDouble(2)}%.1f},""" +
        f""""capture_gap_ms":{"semantics":"capture cadence, reference protocol; us-resolution monotonic stamps (single-JVM)","p50":${cg.getDouble(0)}%.3f,"p95":${cg.getDouble(1)}%.3f,"p99":${cg.getDouble(2)}%.3f,"max":${cg.getDouble(3)}%.3f},""" +
        dedupJson +
        f""""recovery":{"batches":$batches,"applied":$replayed,"ev_per_sec":${nEvents / recoverSec}%.1f}}"""
    } catch { case e: Throwable => s"""{"error":"${e.getClass.getSimpleName}"}""" }
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }
}
