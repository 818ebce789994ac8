package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget shard packing: assign documents (in deterministic id
  * order) to consecutive training shards of ~`budget` tokens each —
  * the dataset-assembly step between curation and the dataloader.
  *
  * The assignment is a global exclusive prefix sum over token counts:
  * doc d goes to shard ⌊prefix(d) / budget⌋. A single `Window.orderBy`
  * cumsum computes it — on ONE partition, the classic scale trap (the
  * o3_lag_gaps lesson). This implementation is the distributed two-pass
  * prefix sum instead:
  *   1. bucket docs by id range (order-preserving), aggregate per-bucket
  *      token totals — one tiny P-row result;
  *   2. turn bucket totals into bucket offsets (window over P rows — the
  *      only single-partition step, P = parallelism, not data size),
  *      broadcast them back, and compute each doc's global prefix as
  *      bucket offset + within-bucket cumsum (partition-local window).
  * No driver collect anywhere; every data-sized step is partitioned.
  * At 1000 executors the plan is two scans + one P-row exchange — the
  * same shape MPI prefix-scan uses.
  */
object Packing {

  /** Per-shard summary (shard, n_docs, total_tokens) of the packing —
    * ordered, deterministic, oracle-comparable.
    *
    * @param budget  target tokens per shard (docs never split; a doc
    *                straddling the boundary stays in the shard its
    *                prefix starts in, so shards can exceed `budget` by
    *                less than one document).
    * @param buckets id-range bucket count for the two-pass prefix sum.
    */
  def tokenShards(docs: DataFrame, budget: Long, buckets: Int = 32,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val t = docs.select(col(idCol).cast("long").as("id"),
      size(split(col(textCol), "\\s+")).cast("long").as("toks"))
    // Order-preserving bucket by id range; computed in-plan (broadcast
    // 1-row scalar) so nothing collects to the driver.
    val stats = t.agg(max(col("id")).as("max_id"))
    val b = t.crossJoin(broadcast(stats))
      .withColumn("bucket",
        floor(col("id") / (floor(col("max_id") / buckets) + 1)))
      .drop("max_id")
    val offsets = b.groupBy("bucket").agg(sum(col("toks")).as("btoks"))
      .withColumn("offset",
        coalesce(sum(col("btoks")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "offset")
    val localW = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(offsets), "bucket")
      .withColumn("prefix",
        col("offset") + coalesce(sum(col("toks")).over(localW), lit(0L)))
      .withColumn("shard", expr(s"prefix div ${budget}L"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("total_tokens"))
      .orderBy(col("shard"))
  }
}
