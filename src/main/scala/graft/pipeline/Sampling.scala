package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * Random sampling is the wrong tool for corpus curation: re-runs must
  * reproduce the same subset bit-for-bit (else downstream caches,
  * dedup decisions, and eval splits drift), and the sample membership
  * must be derivable from CONTENT so that re-ingesting the same
  * document lands the same decision regardless of row order or
  * partitioning. Both operators key on a content hash:
  *
  *  - [[hashSample]]: keep rows whose hash bucket falls under the
  *    fraction — a pure narrow filter over the scan, no shuffle, no
  *    state; the 100 TB shape is "scan, filter, done".
  *  - [[stratifiedQuota]]: at most `quota` rows per block, chosen in
  *    hash order — one shuffle on the block key; the `row_number <= k`
  *    filter triggers Spark's WindowGroupLimit rewrite, so each map
  *    task pre-prunes to its local top-k before the exchange rather
  *    than shuffling whole blocks.
  *
  * Both are exactly reproducible in ANSI SQL (the oracle casts the
  * same sha256 prefix), which is what makes them gate-checkable.
  */
object Sampling {

  /** First 32 bits of sha256(content) as a non-negative long — the
    * deterministic "random" variate both operators order by. */
  def hashBucket(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 8), 16, 10).cast("long")

  /** Keep ~`fraction` of rows, decided per row by content hash: a row's
    * membership never depends on the rest of the corpus. `fraction` is
    * quantized to basis points (1/10000). */
  def hashSample(docs: DataFrame, fraction: Double,
      keyCol: String = "text"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    docs.filter(
      hashBucket(col(keyCol)) % 10000 < math.round(fraction * 10000))
  }

  /** At most `quota` rows per block, selected in (content hash, id)
    * order — a deterministic stratified subsample that keeps every
    * block represented no matter how skewed the block sizes are. */
  def stratifiedQuota(docs: DataFrame, blockCol: String, quota: Int,
      idCol: String = "doc_id", keyCol: String = "text"): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    val byHash = Window.partitionBy(col(blockCol))
      .orderBy(hashBucket(col(keyCol)), col(idCol))
    docs.withColumn("__rk", row_number().over(byHash))
      .filter(col("__rk") <= quota).drop("__rk")
  }

  /** Per-block TOKEN cap: keep each block's documents in id order until
    * the block's cumulative token count reaches `budget` — the
    * per-domain token quota of web-corpus curation (caps are set in
    * tokens, not documents, because domains differ wildly in document
    * length). A document straddling the boundary is kept iff its
    * prefix starts under the budget, so a block always contributes at
    * least one document.
    *
    * Shape: one shuffle on the block key, then a partition-local
    * running sum — the same scale class as [[stratifiedQuota]]; no
    * global window, no driver state.
    */
  def tokenCapPerGroup(docs: DataFrame, blockCol: String, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val before = Window.partitionBy(col(blockCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("__toks",
        size(split(col(textCol), "\\s+")).cast("long"))
      .withColumn("__before",
        coalesce(sum(col("__toks")).over(before), lit(0L)))
      .filter(col("__before") < budget)
      .drop("__toks", "__before")
  }

  /** Deterministic seeded corpus shuffle — the pre-sharding permutation
    * every trainer applies so a corpus streams in pseudo-random order:
    * each row hashes (seed, id) to a variate, lands in `shards` =
    * hash-mod buckets, and takes its position within the shard by
    * (hash, id) order. Re-running with the same seed reproduces the
    * exact permutation; changing the seed is a fresh shuffle.
    *
    * Scale shape: the shard assignment is a narrow map; positions are
    * per-shard windows — parallel across shards, never a global
    * single-partition window. (A global rank would be the d12 two-pass
    * prefix sum; training shards don't need cross-shard order.)
    */
  def seededShuffle(docs: DataFrame, seed: String, shards: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val h = hashBucket(concat(lit(seed + ":"), col(idCol).cast("string")))
    val withShard = docs.select(col(idCol), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(shards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    withShard.withColumn("pos", row_number().over(w))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row draws a seeded uniform from
    * the first 32 bits of md5(seed ‖ id) — engine-portable, unlike
    * seeded PRNG streams — and the k smallest exponential keys
    * −ln(1−u)/w ARE a weight-proportional sample without replacement.
    * The selection is `orderBy(key).limit(k)` — Spark plans
    * TakeOrderedAndProject (per-partition top-k, merge on the driver,
    * no global sort), so the pass over the corpus is a narrow map + a
    * k-row reduction at ANY scale. Membership is a pure function of
    * (seed, id, weight): stable under repartitioning and replayable,
    * the property `rand()`-weighted sampling lacks.
    *
    * CONTRACT: weights must be strictly positive. Rows with
    * `weightCol <= 0` (or null) are EXCLUDED from the draw — A-ES keys
    * are undefined there (w = 0 → ±Inf/NaN, w < 0 deterministically
    * hijacks the sample) — so an input with many non-positive weights
    * returns fewer than k rows. Callers needing to detect contract
    * violations should count `weightCol <= 0 OR weightCol IS NULL`
    * rows themselves; this operator stays a silent filter by design (a
    * row-level require cannot fail fast across executors without an
    * extra action).
    */
  def weightedTopK(df: DataFrame, weightCol: String, k: Int, seed: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val uni = conv(substring(
        md5(concat(lit(seed), col(idCol).cast("string"))), 1, 8),
        16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    // A-ES is only defined for w > 0: a negative weight's exponential
    // key sorts ahead of every valid key (deterministically forcing the
    // row into the sample) and w = 0 yields ±Inf/NaN keys. Rows outside
    // the contract are excluded rather than silently mis-ranked — the
    // distributed analogue of the k > 0 require (a row-level require
    // can't fail fast across executors without an action).
    df.filter(col(weightCol) > 0)
      .withColumn("ekey", -log(lit(1.0) - uni) / col(weightCol))
      .orderBy(col("ekey"), col(idCol))
      .limit(k)
  }

  /** Hash-based train/val/test split (80/10/10 of the bucket space) —
    * membership is a pure function of (seed, id), so the split is
    * stable under re-ingestion, corpus growth, and repartitioning (a
    * row never migrates between splits when other rows change — the
    * property random splits lack). A narrow map over the scan.
    */
  def hashSplit(docs: DataFrame, seed: String,
      idCol: String = "doc_id"): DataFrame = {
    val b = pmod(
      hashBucket(concat(lit(seed + ":"), col(idCol).cast("string"))),
      lit(100L))
    docs.select(col(idCol),
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
        .as("split"))
  }
}
