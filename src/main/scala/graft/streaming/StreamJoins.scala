package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins — the fourth Structured Streaming surface the
  * engine exercises, after the stateful CDC apply (CdcStream), windowed
  * aggregation (w1/w2), and watermark late-drops (w3): two unbounded
  * sides joined on key + event-time interval. The watermarks are
  * load-bearing — they bound BOTH sides' join state, letting the runtime
  * evict a buffered row once no future row on the other side can still
  * match it; without them an inner stream-stream join's state grows
  * forever.
  *
  * The same plan runs in batch mode (`withWatermark` is a no-op there),
  * so the batch gate hash-checks exactly the join the streaming runtime
  * executes — the CdcStream batch-twin pattern. The join keys on the
  * user equality (hash exchange, never a nested loop); the time bound is
  * the residual condition the state manager also uses for eviction.
  */
object StreamJoins {

  /** Every purchase joined to the same user's clicks in the preceding
    * `beforeMs` window — the streaming form of the j13 range-context
    * join. Inner semantics (append-mode capable): purchases with no
    * in-window click do not emit.
    */
  def clickContext(purchases: DataFrame, clicks: DataFrame,
      beforeMs: Long = 7200000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c, expr(
      s"p_user = c_user AND c_ts >= p_ts - INTERVAL ${beforeMs} " +
        "MILLISECONDS AND c_ts <= p_ts"))
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** LEFT OUTER variant of [[clickContext]]: purchases with no in-window
    * click DO emit, with a null click timestamp — the distinct stateful
    * semantics here is WHEN: the streaming runtime can only emit the
    * null row once the click-side watermark proves no matching click can
    * still arrive (state-eviction time), whereas the identical plan in
    * batch mode emits it immediately. Same join state bounds as the
    * inner form — the watermark pair is what makes outer stream-stream
    * joins legal at all.
    */
  def clickContextOuter(purchases: DataFrame, clicks: DataFrame,
      beforeMs: Long = 7200000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c, expr(
      s"p_user = c_user AND c_ts >= p_ts - INTERVAL ${beforeMs} " +
        "MILLISECONDS AND c_ts <= p_ts"), "left_outer")
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts"), col("c_ts"))
  }

  /** FULL OUTER stream-stream interval join — completes the join-mode
    * family (inner [[clickContext]] / left [[clickContextOuter]] /
    * full): unmatched PURCHASES surface with null click time AND
    * unmatched CLICKS surface with null purchase id, each emitted by
    * the streaming runtime at its side's state eviction (watermark-
    * proven no-more-matches). Both sides need a watermark AND the time
    * bound references both event times — the conditions Spark requires
    * before it will run a full-outer stream-stream join at all.
    * Batch mode plans the identical join; `StreamJoinsSpec` pins
    * streaming ≡ batch through MemoryStream.
    */
  def clickContextFull(purchases: DataFrame, clicks: DataFrame,
      beforeMs: Long = 7200000L,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val p = purchases
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", watermarkDelay)
    p.join(c, expr(
      s"p_user = c_user AND c_ts >= p_ts - INTERVAL ${beforeMs} " +
        "MILLISECONDS AND c_ts <= p_ts"), "full_outer")
      .select(col("event_id"), coalesce(col("p_user"), col("c_user"))
          .as("user_id"), col("p_ts"), col("c_ts"))
  }

  /** Stream-static enrichment + windowed rollup — the most common
    * production streaming topology: an unbounded fact stream joined to
    * a bounded dimension, then aggregated per event-time window. The
    * static side carries NO join state (unlike stream-stream, nothing
    * must be buffered for it — the dimension is simply available every
    * micro-batch) and broadcasts, so the only stateful operator in the
    * plan is the window aggregate bounded by the watermark. Events
    * whose key misses the dimension drop (inner enrichment), the same
    * referential filter j6 checks relationally.
    */
  def enrichedWindowCounts(events: DataFrame, dim: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val e = events.select(col("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
    e.join(broadcast(dim.select(col("c_custkey"), col("c_nationkey"))),
        e("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("c_nationkey").as("nation"), col("n"))
  }

  /** W13: streaming decontamination TAG stream — the ingest-time form
    * of [[graft.pipeline.Contamination.contaminatedSpans]]: as
    * documents arrive, emit the id of every one that shares a verbatim
    * `k`-token window with the STATIC eval set, exactly once. A
    * curation ingest pipeline consumes this as the quarantine topic
    * (tag-and-route, the streaming-safe decision — dropping the
    * complement needs the full batch pass, because "clean" can only be
    * decided per-doc after all its windows are checked, and a
    * stream-derived anti join is not an incremental plan).
    *
    * Plan: window explode (stateless projection) → stream-static
    * LEFT SEMI against the broadcast eval digest set (no state — the
    * static side is a build-side hash table, the w8 shape) →
    * `dropDuplicates(id)` collapsing window hits to one emission per
    * doc (the stateful-dedup operator w7 pins; unbounded doc-id state
    * by design here — the tag store IS the dedup ledger at ingest; a
    * deployment that can bound re-delivery adds an event-time
    * watermark exactly as in [[CdcStream.statefulDedup]]'s spec).
    * Batch-mode result is identical (`withWatermark`/dedup degenerate
    * to DISTINCT), so the DuckDB gate hash-checks the same plan the
    * micro-batch runtime executes; StreamJoinsSpec drives MemoryStream
    * and pins streaming ≡ batch.
    */
  def decontaminationTags(docs: DataFrame, evalSet: DataFrame,
      k: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val wins = graft.pipeline.Dedup.tokenWindows(docs, k, idCol, textCol)
    val evalH = graft.pipeline.Dedup.tokenWindows(evalSet, k, idCol, textCol)
      .select(col("h")).distinct()
    wins.select(col(idCol), col("h"))
      .join(broadcast(evalH), "h")
      .select(col(idCol))
      .dropDuplicates(idCol)
  }
}
