package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * All engine queries take an `sfDir` (scale-factor directory) and read the
  * parquet files directly — filters and projections declared downstream are
  * pushed into the parquet scan by Catalyst (verify via
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  *
  * Scale notes: at 100 TB each of these would be a partitioned parquet
  * dataset (e.g. `orders` partitioned by month of `o_orderdate`,
  * `lineitem` bucketed by `l_orderkey` for shuffle-free joins with orders).
  * Nothing in this loader assumes single-file inputs — `spark.read.parquet`
  * takes directories as-is.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Resolved-scan memo: `spark.read.parquet` pays file listing + parquet
  // footer schema inference + analysis on EVERY call — measured ~100-170 ms
  // of driver time per query over these dirs, the single largest warm-query
  // cost in the catalog (a query touching 5 tables pays it 5x). A real
  // deployment registers tables once in a catalog/metastore and re-resolves
  // from cached metadata; this memo is that catalog, scoped per
  // SparkSession (DataFrames are session-bound; reference-equality keys
  // guarantee a restarted session never sees a predecessor's plans) and
  // per path. Bounded access-order LRU rather than a weak map: a
  // DataFrame value strongly references its session, so weak session keys
  // would never collect (value→key self-pin); the LRU bounds how many
  // dead-session entries new activity can pin before evicting them.
  private final val MemoCap = 256
  private val scanMemo =
    new java.util.LinkedHashMap[(SparkSession, String), DataFrame](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String), DataFrame]): Boolean =
        size() > MemoCap
    }

  /** Drop memoized scans under `dir` for every session — required after an
    * in-place rewrite of a table directory (ScaleGen regeneration): a
    * cached DataFrame pins its file listing at first resolution.
    */
  def invalidate(dir: String): Unit = scanMemo.synchronized {
    scanMemo.keySet.removeIf(k => k._2.startsWith(dir))
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = (spark, s"$sfDir/$name.parquet")
    scanMemo.synchronized { Option(scanMemo.get(key)) }.getOrElse {
      // Resolve outside the lock: schema inference does I/O, and a
      // concurrent duplicate resolve is harmless (last write wins).
      val df = spark.read.parquet(key._2)
      scanMemo.synchronized { scanMemo.put(key, df) }
      df
    }
  }

  def region(spark: SparkSession, d: String): DataFrame = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = apply(spark, d, "lineitem")
  /** `events.parquet` has shipped with two physical `ts` encodings across
    * testdata generations: TIMESTAMP(NANOS) — which Spark's parquet reader
    * rejects by default, so it is read as long nanos and converted with
    * integer division (a double division would lose precision above
    * 2^53 ns) — and plain TIMESTAMP(MICROS) without UTC adjustment, which
    * reads as TIMESTAMP_NTZ. Both normalize to a microsecond
    * TimestampType here; the session timezone is pinned to UTC by every
    * entry point, so the NTZ→TZ cast is wall-clock identity.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  /** The text/vector pipeline tables ship as single-row-group parquet in
    * the test decades, and parquet cannot split a row group — so EVERY
    * text/vector operator's scan stage (regex batteries, tokenization,
    * shingling, cosine kernels: per-row work 100-1000x the scan cost)
    * ran on ONE core until its first exchange (r15, measured: d48's
    * five 1-task 1-2 s legs). A deterministic hash rebalance on the id
    * column spreads that CPU across the session's cores for the price
    * of shuffling the (tiny) table once. Size-gated so it vanishes at
    * real scale: past `GRAFT_SCAN_REBALANCE_MB` (default 2 MB) per core
    * the scan is wide enough on its own and the extra exchange would be
    * the bug, not the fix. Hash-by-id (not round-robin) keeps the
    * assignment independent of input row order. Memoized like the raw
    * scans.
    */
  private val RebalancePerCoreBytes: Long =
    sys.env.get("GRAFT_SCAN_REBALANCE_MB").map(_.toLong)
      .getOrElse(2L) << 20
  private def rebalancedSmall(spark: SparkSession, d: String, name: String,
      idCol: String): DataFrame = {
    val key = (spark, s"$d/$name.parquet#rebalanced")
    scanMemo.synchronized { Option(scanMemo.get(key)) }.getOrElse {
      val raw = apply(spark, d, name)
      val cores = spark.sparkContext.defaultParallelism
      val bytes = raw.queryExecution.optimizedPlan.stats.sizeInBytes
      val df =
        if (RebalancePerCoreBytes > 0 &&
            bytes < BigInt(RebalancePerCoreBytes) * cores)
          raw.repartition(cores, col(idCol))
        else raw
      scanMemo.synchronized { scanMemo.put(key, df) }
      df
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame =
    rebalancedSmall(spark, d, "documents", "doc_id")
  /** The raw (un-rebalanced) documents scan, for the few consumers whose
    * pipelines are many-small-stage loops rather than per-row CPU — the
    * extra partitions multiply their task counts for no win (r15 A/B:
    * t22/t23 +26%, t25 +29%, d22 +21% under the rebalance, vs d31 −68%,
    * d37 −66%, d32 −50%, t17 −40% for the scan-dense battery).
    */
  def documentsRaw(spark: SparkSession, d: String): DataFrame =
    apply(spark, d, "documents")
  // embeddings deliberately NOT rebalanced (r15, measured): its consumers
  // are join/top-k shaped — widening a 2k-row scan to 32 partitions
  // multiplied downstream task counts for no CPU win (d49 +57%, d44 +30%
  // in isolated A/B), where the documents consumers (regex/tokenize/
  // shingle batteries) are embarrassingly per-row and won big.
  def embeddings(spark: SparkSession, d: String): DataFrame =
    apply(spark, d, "embeddings")

  /** Register every table as a temp view (used by tests / ad-hoc SQL). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
