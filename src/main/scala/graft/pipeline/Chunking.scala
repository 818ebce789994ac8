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
