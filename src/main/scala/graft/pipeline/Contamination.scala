package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Eval-set contamination detection — the decontamination stage of a
  * training-data pipeline: find corpus documents that share word
  * n-grams with a benchmark/eval set, so they can be dropped (or the
  * benchmark discounted) before training.
  *
  * Shape chosen for the 100 TB corpus / small eval-set asymmetry: the
  * eval side collapses to its DISTINCT shingle vocabulary and is
  * broadcast, so the corpus is touched by exactly one narrow pass —
  * shingle (native codegen'd `word_shingles`), explode, hash-probe the
  * broadcast set, partial-aggregate per doc. No shuffle ever carries
  * corpus text; the only exchange is the final per-doc count
  * aggregation, keyed on doc_id. An eval set too big to broadcast is
  * the signal the caller wants [[Dedup.ngramJaccard]]'s inverted-index
  * path instead.
  */
object Contamination {

  /** Per-corpus-doc overlap against the eval set's shingle vocabulary:
    * (idCol, n_shingles, n_hits, frac), only for docs with at least one
    * hit — the contamination report. `frac` is the contaminated share
    * of the doc's distinct shingles, rounded to 4 places.
    */
  def overlap(corpus: DataFrame, evalSet: DataFrame, k: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val corpusSh = corpus.select(col(idCol),
        array_distinct(Dedup.shingles(col(textCol), k)).as("sh"))
      .select(col(idCol), size(col("sh")).as("n_shingles"),
        explode(col("sh")).as("s"))
    val evalSh = evalSet.select(explode(
        array_distinct(Dedup.shingles(col(textCol), k))).as("s"))
      .distinct()
    corpusSh.join(broadcast(evalSh), "s")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(lit(1)).cast("int").as("n_hits"))
      .withColumn("frac",
        round(col("n_hits").cast("double") / col("n_shingles"), 4))
      .select(col(idCol), col("n_shingles"), col("n_hits"), col("frac"))
  }
}
