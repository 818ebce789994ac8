package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie, Santurkar, Ma,
  * Liang: "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023): score every raw-corpus document by how
  * much more likely a TARGET-domain bag-of-hashed-ngrams model makes it
  * than the raw-corpus model, log w(x) = Σ_features [ln p̂_tgt(b) −
  * ln p̂_raw(b)], then resample proportional to w. The hashed-feature
  * trick is what makes it corpus-scale: both "models" are just one
  * B-bucket count vector each (B = 64 here; 10k in the paper — the
  * testdata vocabulary is 31 words, so a small B keeps buckets
  * multiply-occupied the way the paper's 10k does over web text).
  *
  * Scale shape: one bigram explode per corpus feeding a B-key count
  * (map-side combined — the shuffle carries at most B rows per task),
  * the two totals are scalar aggregates, the per-bucket log-ratio table
  * is B rows and broadcast, and the per-document score is one
  * doc_id-keyed sum. Nothing is ever all-pairs and no model state
  * outlives its aggregate — the exact shape that holds at 100 TB.
  *
  * Cross-engine determinism: the bucket hash is the engine-portable
  * sha256-prefix ([[Sampling.hashBucket]], the d7/d8 discipline), add-1
  * smoothing keeps every term finite, the log-ratio is built from exact
  * BIGINT counts in ONE identical expression tree per engine, and the
  * per-doc sum (≤ ~doc-length terms of magnitude ~1) rounds at 6
  * decimals — summation-order ulps are ~1e-13 relative.
  *
  * Selection on top of these weights is the already-gated machinery:
  * `exp(log_w)` feeds [[Sampling.weightedTopK]] (seeded A-ES) for the
  * resampling step.
  */
object Dsir {

  /** Word bigrams of `textCol` (non-distinct — DSIR features are bag
    * counts, not sets). Documents under 2 words contribute nothing. */
  private def bigrams(textCol: Column): Column = {
    val w = split(textCol, "\\s+")
    // The guard matters: sequence(0, n-2) at n < 2 would emit a
    // DESCENDING sequence (Spark infers step -1), not an empty one.
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(w) - 2),
        i => concat_ws(" ", slice(w, i + 1, lit(2)))))
  }

  /** (id, bucket) — one row per bigram occurrence, bucketed by the
    * portable sha256-prefix hash. */
  private def bucketed(docs: DataFrame, buckets: Int, idCol: String)
      : DataFrame =
    docs.select(col(idCol), explode(bigrams(col("text"))).as("bg"))
      .select(col(idCol),
        pmod(Sampling.hashBucket(col("bg")), lit(buckets.toLong))
          .as("bucket"))

  /** Per-document DSIR log importance weight of every `raw` document
    * against the `target` domain sample. Emits (idCol, n_bigrams,
    * log_w); raw documents with no bigram (under 2 words) are absent —
    * they carry no evidence either way and the paper's featurizer
    * skips them too.
    */
  def logImportanceWeights(target: DataFrame, raw: DataFrame,
      buckets: Int = 64, idCol: String = "doc_id"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val tb = bucketed(target, buckets, idCol)
    // raw's bucketed form feeds TWO consumers (its count table and the
    // final scoring join), and bucketing is the expensive bit — a
    // sha256 per bigram occurrence. Cached (r14, guide §5: reuse beats
    // recompute when the recompute is a full hash pass), the raw corpus
    // pays the explode+hash once instead of twice; released by the
    // session-hygiene hook like every operator-internal cache.
    val rb = graft.CacheRegistry.register(
      bucketed(raw, buckets, idCol).cache())
    // The B-row count tables are CACHED (trivially small) because each
    // feeds two consumers — the ratio join and its own total — and Spark
    // does not dedupe common subtrees: uncached, the plan audit showed
    // every consumer as its own full corpus scan (5 parquet passes);
    // cached, each corpus is read once for its counts plus the
    // unavoidable scoring pass over raw.
    val ct = graft.CacheRegistry.register(
      tb.groupBy(col("bucket")).agg(count(lit(1)).as("ct")).cache())
    val nt = ct.agg(sum(col("ct")).as("nt"))
    val cs = graft.CacheRegistry.register(
      rb.groupBy(col("bucket")).agg(count(lit(1)).as("cs")).cache())
    val ns = cs.agg(sum(col("cs")).as("ns"))
    // Add-1-smoothed multinomials over B buckets; buckets the target
    // never saw still score (ct = 0 → the smoothing floor), which is
    // why the join is FROM the raw side with a coalesce, not inner.
    val ratio = cs
      .join(ct, Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(ns))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0) /
            (col("nt").cast("double") + buckets.toDouble)) -
          log((col("cs").cast("double") + 1.0) /
            (col("ns").cast("double") + buckets.toDouble))).as("lr"))
    rb.join(broadcast(ratio), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        round(sum(col("lr")), 6).as("log_w"))
  }
}
