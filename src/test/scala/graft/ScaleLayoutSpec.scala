package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout evidence for the 100 TB posture that the docs argue
  * and the plan audits reference: bucketed tables co-locate joins with
  * ZERO exchanges, and AQE splits skewed join partitions at runtime.
  * Both are asserted against the executed plan, not described.
  */
class ScaleLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with no exchange at all") {
    val sf = "/root/testdata/sf0.001"
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      // The join itself must not shuffle either side: bucket layout IS
      // the partitioning. (The final aggregate also reuses it, so the
      // whole plan is exchange-free.)
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
      // And it must still be correct.
      val viaBuckets = joined.collect().map(r =>
        r.getLong(0) -> r.getDouble(1)).toMap
      val direct = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(viaBuckets == direct)
    }
  }

  test("date-partitioned layout prunes to one partition at the scan") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-part").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val days = spark.read.parquet(dir).select(col("day")).distinct()
      .collect().map(_.getDate(0).toString).sorted
    assert(days.length > 1, "fixture must span multiple days")
    val q = spark.read.parquet(dir)
      .filter(col("day") === days.head)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    // The day predicate must be a PARTITION filter (planning-time
    // pruning), not a row-level data filter.
    assert(scan.contains("PartitionFilters") && scan.contains("day"), scan)
    // Correctness: pruned result equals the unpartitioned filter.
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(to_date(col("ts")) === days.head)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // ... and the executed scan must have touched ONLY that partition's
    // files (metrics, not plan text — the toString elides the count).
    val fileScan = {
      def find(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => find(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => find(s.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(f)
          case other => other.children.flatMap(find)
        }
      find(q.queryExecution.executedPlan).head
    }
    val filesRead = fileScan.metrics("numFiles").value
    val filesInPartition = new java.io.File(s"$dir/day=${days.head}")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(filesRead == filesInPartition,
      s"read $filesRead files, partition holds $filesInPartition")
  }

  test("AQE splits a skewed join partition at runtime") {
    // One hot key carrying ~all rows vs a flat dimension: with the skew
    // thresholds scaled down to test size, AQE must mark the join
    // skewed (skew=true in the plan) and split the hot partition.
    // The hot key must not be a literal: Catalyst constant-folds a
    // lit() key into a pushed equality + cartesian and no join shuffle
    // ever happens (observed). 90% of rows land on key 7, the rest
    // spread so the key column stays genuinely data-dependent.
    // ... and the shuffled bytes must actually exceed the threshold
    // AFTER compression: a pruned-to-the-key hot partition is a run of
    // identical longs that LZ4 crushes below any realistic threshold
    // (observed — no skew mark). The unique string payload keeps the
    // partition honestly heavy, like a real fact row would.
    val hot = spark.range(0, 200000).select(
      when(col("id") % 10 === 0, col("id") % 64).otherwise(lit(7L)).as("k"),
      md5(col("id").cast("string")).as("payload"))
    val cold = spark.range(0, 64).select(col("id").as("k"),
      (col("id") * 2).as("dim"))
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      // The downstream aggregate re-shuffles the join output, which
      // makes the skew rule bail by default ("would add a shuffle") —
      // force it so the split is observable in a closed plan. On a real
      // pipeline the join result feeds a sink or a co-partitioned op
      // and the rule fires unforced.
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val joined = hot.join(cold, "k")
        .agg(count(lit(1)).as("n"), sum(col("dim")).as("s"),
          sum(length(col("payload"))).as("p"))
      val row = joined.collect()(0)
      assert(row.getLong(0) == 200000L, "join must still be correct")
      assert(row.getLong(1) == hot.select(
        (col("k") * 2).as("d")).agg(sum(col("d"))).collect()(0).getLong(0),
        "per-row dim values must survive the skew split")
      assert(row.getLong(2) == 200000L * 32,
        "every payload row must survive exactly once")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    }
  }

  test("dynamic partition overwrite touches only the written partitions") {
    // The idempotent-rerun primitive: re-computing one day must replace
    // exactly that day, not truncate the table (static overwrite) and
    // not duplicate rows (append). At 100 TB this is the difference
    // between rewriting 300 GB and rewriting the lake.
    val dir = java.nio.file.Files
      .createTempDirectory("dyn_overwrite").toString
    val day = (col("id") % 3).cast("int")
    spark.range(300).select(col("id"), day.as("day"))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    withConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
      // Re-run day 1 with a DIFFERENT row set (half the rows, shifted).
      spark.range(1000, 1050).select(col("id"), lit(1).as("day"))
        .write.partitionBy("day").mode("overwrite").parquet(dir)
    }
    val after = spark.read.parquet(dir)
    val byDay = after.groupBy(col("day")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDay(0) == 100L && byDay(2) == 100L,
      "untouched partitions must survive byte-for-byte")
    assert(byDay(1) == 50L, "the rewritten partition holds ONLY the new run")
    assert(after.filter(col("day") === 1 && col("id") < 1000).count() == 0,
      "no stale rows in the rewritten partition")
  }

  test("schema evolution: mergeSchema unions columns, old files read as null") {
    // The lake-reader semantics a year-long table accumulates: files
    // written before a column existed must stay readable, surfacing
    // NULL for the added column, and the union schema must come from
    // footers, not from luck in file listing order.
    val dir = java.nio.file.Files
      .createTempDirectory("schema_evo").toString
    spark.range(0, 100).select(col("id"))
      .write.mode("append").parquet(dir)
    spark.range(100, 150)
      .select(col("id"), (col("id") * 2).as("score"))
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "score"))
    assert(merged.count() == 150)
    assert(merged.filter(col("score").isNull).count() == 100,
      "pre-evolution rows surface NULL for the added column")
    assert(merged.filter(col("score") === col("id") * 2).count() == 50,
      "post-evolution rows keep their values")
  }

  test("z-ordered layout bounds file overlap on the non-leading dimension") {
    // Uniform 2-D grid, 64 files. A y-box predicate under a linear
    // x-sort overlaps EVERY file (y spans the full domain in each);
    // under a z-order sort each file covers a compact 2-D tile, so
    // min/max footer stats rule most files out. File-level min/max is
    // exactly what parquet row-group pruning and Delta/Iceberg data
    // skipping consume — measured here from the written files
    // themselves, not asserted by narrative.
    val n = 1 << 16
    val pts = spark.range(n).select(
      (col("id") % 256).as("x"),
      ((col("id") * 2654435761L) % 256).as("y"))
    def overlapCount(sortKey: org.apache.spark.sql.Column): Long = {
      val dir = java.nio.file.Files
        .createTempDirectory("zorder_layout").toString
      pts.repartitionByRange(64, sortKey).write
        .mode("overwrite").parquet(dir)
      // Per-file min/max of y — the footer stats a pruning reader uses.
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("ylo"), max(col("y")).as("yhi"))
      val hit = stats
        .filter(col("yhi") >= 96 && col("ylo") < 112) // y in [96,112)
        .count()
      val total = stats.count()
      assert(total >= 48, s"expected ~64 files, got $total")
      hit
    }
    val zHits = overlapCount(graft.functions.ZOrder.zorder2(
      col("x"), col("y"), bits = 8))
    val linHits = overlapCount(col("x"))
    // Linear x-sort: every file spans the y domain -> all files overlap.
    // Z-order: a 16/256 y-slice intersects only the tiles that cross it.
    assert(linHits >= 48, s"x-sorted layout should overlap ~all files: $linHits")
    assert(zHits * 2 <= linHits,
      s"z-order must at least halve the candidate files: $zHits vs $linHits")
  }

  test("parquet bloom filter prunes row groups stats and dictionary cannot") {
    // A point lookup on a random-valued high-cardinality column is the
    // worst case for min/max stats (every row group spans the whole
    // value space) — and with dictionary encoding disabled (big string
    // columns fall out of dictionary at scale anyway) nothing else can
    // prune. A written column bloom filter restores the skip: the miss
    // probe must decode ZERO rows where the plain file decodes ALL of
    // them. This is the fingerprint-lookup layout for d1/d22-style
    // exact-dedup probes against a 100 TB corpus at rest.
    val dir = java.nio.file.Files
      .createTempDirectory("graft-bloom").toString
    val df = spark.range(200000)
      .select(col("id"), md5(col("id").cast("string")).as("fp"))
    def write(path: String, bloom: Boolean): Unit = {
      val w = df.coalesce(1).write
        .option("parquet.block.size", "262144")
        .option("parquet.enable.dictionary", "false")
      (if (bloom)
        w.option("parquet.bloom.filter.enabled#fp", "true")
          .option("parquet.bloom.filter.expected.ndv#fp", "200000")
      else w).mode("overwrite").parquet(path)
    }
    write(s"$dir/plain", bloom = false)
    write(s"$dir/bloom", bloom = true)
    def scanRowsForMiss(path: String): Long = {
      // Mid-space 32-hex probe: lexicographically INSIDE every page's
      // [min, max] (a low value like "0000…" lets plain column-index
      // min/max pruning skip most pages — measured 11,912 surviving
      // rows — which is exactly the stats path this test must deny).
      val q = spark.read.parquet(path)
        .filter(col("fp") === "7fffffff7fffffff7fffffff7fffffff")
      assert(q.count() == 0)
      q.collect() // materialize so the scan metric is populated
      def find(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
        p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => find(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => find(s.plan)
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            Seq(f)
          case other => other.children.flatMap(find)
        }
      find(q.queryExecution.executedPlan).head
        .metrics("numOutputRows").value
    }
    val plainRows = scanRowsForMiss(s"$dir/plain")
    val bloomRows = scanRowsForMiss(s"$dir/bloom")
    assert(plainRows == 200000L,
      s"plain file must decode every row group for the miss: $plainRows")
    assert(bloomRows == 0L,
      s"bloom-filtered file must prune every row group: $bloomRows")
  }

  test("parquet aggregate pushdown: COUNT(*) becomes a metadata-only scan") {
    // The DSv2 read path can answer COUNT(*)/MIN/MAX from parquet footer
    // statistics without materializing a single row — at 100 TB that is
    // the difference between a metadata pass and a full scan. The gates
    // run the default DSv1 path (plan-stability over the whole catalog);
    // this spec pins that flipping the engine to v2 + aggregatePushdown
    // yields the pushed plan, so the optimization is one conf away, and
    // that it returns the same answer as the row-scan count.
    val before = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val df = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet")
        .agg(count(lit(1)))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)]"),
        s"COUNT(*) must push into the scan:\n${plan.take(500)}")
      val pushed = df.head().getLong(0)
      spark.conf.set("spark.sql.sources.useV1SourceList", "parquet")
      val scanned = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet").count()
      assert(pushed == scanned,
        "footer-statistics count must equal the row-scan count")
    } finally {
      before match {
        case Some(v) => spark.conf.set("spark.sql.sources.useV1SourceList", v)
        case None => spark.conf.unset("spark.sql.sources.useV1SourceList")
      }
      spark.conf.unset("spark.sql.parquet.aggregatePushdown")
    }
  }
}
