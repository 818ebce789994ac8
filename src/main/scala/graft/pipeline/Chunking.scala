package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking with overlap — the
  * document→embedding-unit expansion of a retrieval/embedding pipeline:
  * each chunk becomes one embedding row, and the `window - stride`
  * token overlap preserves context across chunk boundaries.
  *
  * Shape: a pure map-side generator. Split, compute the chunk count
  * arithmetically, explode a `sequence`, slice each chunk with
  * `element_at` — every expression a codegen'd builtin, so the whole
  * operator runs inside the scan's WholeStageCodegen span. No shuffle,
  * no state, no UDF; fan-out is ~n_tokens/stride per document, known at
  * plan time. At 100 TB this is "read, expand, write" with perfect
  * input partitioning — the downstream embedding step (see
  * [[Similarity]]) is where the first exchange happens.
  */
object Chunking {

  /** One row per (doc, chunk): `chunk_idx`, the token count of the
    * chunk, and its first/last token — cheap content anchors that let
    * an oracle pin the slicing arithmetic without shipping whole chunk
    * strings.
    *
    * Chunks start at multiples of `stride` and span up to `window`
    * tokens. The last chunk is the first whose span reaches the end of
    * the document; a document shorter than `window` yields exactly one
    * chunk. With `stride <= window` every token lands in at least one
    * chunk.
    */
  /** Content-defined chunking — boundaries chosen by the CONTENT, not by
    * position: a chunk ends after token `i` whenever the fingerprint of
    * the k-gram ending at `i` satisfies `hash % divisor == 0` (the
    * rsync/FastCDC gear-hash idea at word granularity). The property
    * fixed-stride chunking ([[slidingChunks]]) cannot give: inserting or
    * deleting tokens only perturbs chunks that OVERLAP the edit — every
    * boundary after it re-synchronizes, so downstream chunk-hash dedup
    * ([[Dedup.chunkShared]]-style) still matches the unedited remainder
    * of near-identical documents. Expected chunk length = `divisor`
    * tokens.
    *
    * Shape: a pure map-side generator like [[slidingChunks]] — split,
    * boundary positions via `filter` over a `sequence` (the fingerprint
    * is md5 of the k tokens ending at each position; no rolling state
    * needed because the window is re-read per position, k is tiny),
    * chunk spans from zipped boundary arrays, one `posexplode`. Zero
    * shuffle, zero state; deterministic, so chunk identity is stable
    * under repartitioning and replay.
    *
    * Emits (idCol, chunk_idx, n_tokens, chunk_hash) where chunk_hash is
    * md5 of the space-joined chunk tokens — the dedup key.
    */
  def contentDefinedChunks(docs: DataFrame, k: Int = 3, divisor: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(divisor > 0, s"divisor must be positive, got $divisor")
    // Fingerprint of the k-gram ending at 1-based position i: first 4 hex
    // chars of md5 → 16-bit int (the d7/hashBucket idiom, mirrored
    // exactly by the DuckDB oracle's ('0x' || substr(md5,1,4))::BIGINT).
    def fp(i: org.apache.spark.sql.Column) =
      conv(substring(md5(concat_ws(" ",
        slice(col("__toks"), i - lit(k) + lit(1), lit(k)))), 1, 4), 16, 10)
        .cast("long")
    docs
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .withColumn("__n", size(col("__toks")))
      // Boundary candidates live at i in [k, n-1] (a boundary after the
      // last token is vacuous; positions before k have no full k-gram).
      // sequence() DESCENDS when start > stop, so short docs guard to [].
      .withColumn("__bnds",
        when(col("__n") - 1 >= k,
          filter(sequence(lit(k), col("__n") - 1),
            i => pmod(fp(i), lit(divisor.toLong)) === 0))
          .otherwise(array().cast("array<int>")))
      .withColumn("__starts",
        concat(array(lit(1)), transform(col("__bnds"), b => b + 1)))
      .withColumn("__ends", concat(col("__bnds"), array(col("__n"))))
      .select(col(idCol), col("__toks"),
        posexplode(arrays_zip(col("__starts"), col("__ends"))))
      .select(col(idCol), col("pos").as("chunk_idx"),
        (col("col.__ends") - col("col.__starts") + 1).as("n_tokens"),
        md5(concat_ws(" ", slice(col("__toks"), col("col.__starts"),
          col("col.__ends") - col("col.__starts") + 1))).as("chunk_hash"))
  }

  def slidingChunks(docs: DataFrame, window: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    docs
      .withColumn("__toks", split(col(textCol), "\\s+"))
      .withColumn("__nt", size(col("__toks")))
      // ceil over a DOUBLE quotient: the integer '/' would truncate and
      // lose the final partial chunk.
      .withColumn("__nchunks",
        when(col("__nt") <= window, lit(1)).otherwise(
          ceil((col("__nt") - window) / lit(stride.toDouble)).cast("int")
            + 1))
      .select(col(idCol), col("__toks").as("__t"), col("__nt").as("__n"),
        explode(sequence(lit(0), col("__nchunks") - 1)).as("chunk_idx"))
      .withColumn("n_tokens",
        least(lit(window), col("__n") - col("chunk_idx") * stride))
      .select(col(idCol), col("chunk_idx"), col("n_tokens"),
        element_at(col("__t"), col("chunk_idx") * stride + 1)
          .as("first_tok"),
        element_at(col("__t"),
          col("chunk_idx") * stride + col("n_tokens")).as("last_tok"))
  }
}
