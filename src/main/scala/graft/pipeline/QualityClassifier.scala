package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words quality classifier — the fastText-style linear
  * quality filter of the CCNet / GPT-3 / LLaMA curation stacks: train a
  * log-linear model on a small labeled sample (positives = a trusted
  * high-quality block, negatives = the raw crawl), then score EVERY
  * corpus document and keep the ones the model prefers. The model here
  * is multinomial Naive Bayes over hashed unigram buckets, which makes
  * the "train" phase two B-bucket count aggregates and the "inference"
  * phase one broadcast join — both fully relational, no MLlib state.
  *
  * Relation to [[Dsir]]: DSIR computes importance WEIGHTS (bigram LLR
  * against the raw distribution) to feed a resampler; this is the
  * classification sibling — unigram class-conditional log-odds plus a
  * class prior, a hard keep/drop decision per document, and the
  * per-source precision surface a curation team actually reviews.
  *
  * Scale shape: training = one token explode per labeled side feeding a
  * B-key count (map-side combined — at most B rows per task reach the
  * shuffle); the weight table is B rows, built from the two cached count
  * tables plus four broadcast scalars, and broadcast to the scoring
  * pass; scoring = one corpus pass with a doc-keyed partial sum. Nothing
  * all-pairs, no model state outside the B-row table — the same shape
  * that holds at 100 TB, where the labeled sides are sample-sized and
  * the scored corpus is the big thing touched exactly once.
  *
  * Cross-engine determinism (the d35 discipline): the bucket hash is the
  * portable sha256-prefix ([[Sampling.hashBucket]]), add-1 smoothing
  * keeps every log finite, weights come from exact BIGINT counts in one
  * identical expression tree per engine, and the per-doc score rounds at
  * 6 decimals before the keep decision — so the decision boundary itself
  * is engine-exact.
  */
object QualityClassifier {

  /** Whitespace unigrams, non-distinct — NB features are bag counts. */
  private def toks(textCol: Column): Column = split(textCol, "\\s+")

  /** (id, bucket) — one row per token occurrence. */
  private def bucketed(docs: DataFrame, buckets: Int, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), explode(toks(col(textCol))).as("tok"))
      .select(col(idCol),
        pmod(Sampling.hashBucket(col("tok")), lit(buckets.toLong))
          .as("bucket"))

  /** Train on `positive` vs `negative`, score every `toScore` document.
    * Emits (idCol, n_tokens, score, keep): score = ln P(pos)/P(neg) +
    * Σ_tokens [ln p̂_pos(b) − ln p̂_neg(b)] rounded at 6, keep = score>0
    * (the MAP decision). Documents of `toScore` always appear — every
    * non-empty text yields at least one token under `\s+`, and a token
    * whose bucket NEITHER training class saw contributes zero log-odds
    * (the scoring join is a left join, not an inner join, so a drifted
    * corpus document made entirely of unseen buckets still scores —
    * at the bare prior — instead of silently dropping out).
    */
  def score(positive: DataFrame, negative: DataFrame, toScore: DataFrame,
      buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // B-row count tables cached (the Dsir rationale: each feeds the
    // weight join AND its own total, and Spark does not dedupe common
    // subtrees — uncached, each consumer is its own labeled-side scan).
    val cp = graft.CacheRegistry.register(
      bucketed(positive, buckets, idCol, textCol)
        .groupBy(col("bucket")).agg(count(lit(1)).as("cp")).cache())
    val cn = graft.CacheRegistry.register(
      bucketed(negative, buckets, idCol, textCol)
        .groupBy(col("bucket")).agg(count(lit(1)).as("cn")).cache())
    val np = cp.agg(sum(col("cp")).as("np"))
    val nn = cn.agg(sum(col("cn")).as("nn"))
    // Class prior from document counts (column-pruned count scans).
    val dp = positive.agg(count(lit(1)).cast("double").as("dp"))
    val dn = negative.agg(count(lit(1)).cast("double").as("dn"))
    // Full outer: a bucket only one class saw still gets a weight (the
    // other side sits at the smoothing floor); a bucket neither saw
    // cannot occur while scoring pos ∪ neg-distributed text, and if the
    // scored corpus drifts beyond both, its unseen tokens carry zero
    // log-odds via the left join + coalesce below (the NB unseen-token
    // convention, applied per token so the DOCUMENT never drops).
    val weights = cp.join(cn, Seq("bucket"), "full_outer")
      .crossJoin(broadcast(np)).crossJoin(broadcast(nn))
      .select(col("bucket"),
        (log((coalesce(col("cp"), lit(0L)).cast("double") + 1.0) /
            (col("np").cast("double") + buckets.toDouble)) -
          log((coalesce(col("cn"), lit(0L)).cast("double") + 1.0) /
            (col("nn").cast("double") + buckets.toDouble))).as("w"))
    val prior = dp.crossJoin(dn)
      .select(log(col("dp") / col("dn")).as("prior"))
    val scored = bucketed(toScore, buckets, idCol, textCol)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(coalesce(col("w"), lit(0.0))).as("sw"))
      .crossJoin(broadcast(prior))
      .withColumn("score", round(col("prior") + col("sw"), 6))
    scored.select(col(idCol), col("n_tokens"), col("score"),
      (col("score") > 0.0).as("keep"))
  }
}
