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

  /** D40: decontamination SPANS — the positional refinement of
    * [[overlap]] and the cross-corpus sibling of [[Dedup.dupSpans]]:
    * the GPT-3/PaLM decontamination pass marks every training-doc
    * `k`-token window that appears verbatim anywhere in the eval set,
    * then merges adjacent hits into maximal spans — the exact text
    * ranges a span-surgery decontaminator cuts (versus [[overlap]]'s
    * doc-level drop/discount counts, which cannot say WHERE the leak
    * is). Returns (idCol, span_start, span_end, n_windows), 0-based
    * inclusive token indices into the training document.
    *
    * Scale shape: the eval side collapses to its distinct window
    * digests and broadcasts (the [[overlap]] asymmetry argument — an
    * eval set is benchmark-sized by definition); the corpus is touched
    * by one [[Dedup.tokenWindows]] pass, hash-probes the broadcast set
    * map-side, and the island merge windows per document. The only
    * exchange carries flagged (id, pos) rows — contaminated windows
    * only, a vanishing fraction of a healthy corpus.
    */
  def contaminatedSpans(corpus: DataFrame, evalSet: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, s"window size must be positive, got $k")
    val wins = Dedup.tokenWindows(corpus, k, idCol, textCol)
    val evalH = Dedup.tokenWindows(evalSet, k, idCol, textCol)
      .select(col("h")).distinct()
    Dedup.mergeSpans(wins.join(broadcast(evalH), "h"), k, idCol)
  }

  /** D45: per-EVAL-SAMPLE dirtiness — the direction [[overlap]] and
    * [[contaminatedSpans]] do not report: instead of marking TRAINING
    * documents, grade each eval/benchmark sample by how much of IT leaked
    * into the training corpus (the GPT-3 appendix-C / Llama-2 A.6
    * reporting form: benchmark numbers are then quoted on the clean
    * subset). A token of an eval doc is contaminated when it lies inside
    * some `k`-token window of that doc that occurs verbatim anywhere in
    * the training corpus. Returns one row per eval doc: (idCol,
    * n_tokens, n_contaminated, dirty_frac, bucket) with bucket ∈
    * clean (no hit) / dirty (> `dirtyAbove` of tokens hit) / partial.
    *
    * Scale shape — the reverse of [[contaminatedSpans]]'s asymmetry,
    * resolved the same way because the eval set is the small side in
    * BOTH directions: the eval windows broadcast into a single corpus
    * pass, and only corpus digests that match an eval window leave that
    * pass (≤ |eval windows| rows, benchmark-sized), are deduped, and
    * broadcast back over the eval windows. The 100 TB corpus is touched
    * once, shuffles nothing but matched digests, and every later stage
    * is eval-sized. Overlapping hit windows merge via
    * [[Dedup.coverSpans]] first — the coverage merge, not the stride-1
    * island merge, so two hit windows whose coverages overlap WITHOUT a
    * bridging hit between them (e.g. positions 0 and 2, k = 5: two
    * corpus fragments of one eval sample) still count each covered
    * token exactly once and `dirty_frac` can never exceed 1.
    */
  def evalDirtiness(corpus: DataFrame, evalSet: DataFrame, k: Int = 5,
      dirtyAbove: Double = 0.8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"window size must be positive, got $k")
    val evalWins = Dedup.tokenWindows(evalSet, k, idCol, textCol)
    val evalH = evalWins.select(col("h")).distinct()
    // The one corpus-wide pass: semi-join against the broadcast eval
    // vocabulary, keep only the DISTINCT matched digests.
    val hits = Dedup.tokenWindows(corpus, k, idCol, textCol)
      .join(broadcast(evalH), "h").select(col("h")).distinct()
    val spans = Dedup.coverSpans(evalWins.join(broadcast(hits), "h"),
      k, idCol)
    val covered = spans.groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start") + 1).cast("int")
        .as("n_contaminated"))
    val frac = round(col("n_contaminated").cast("double") /
      col("n_tokens"), 6)
    evalSet.select(col(idCol),
        size(Dedup.words(col(textCol))).cast("int").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .withColumn("n_contaminated",
        coalesce(col("n_contaminated"), lit(0)).cast("int"))
      .select(col(idCol), col("n_tokens"), col("n_contaminated"),
        frac.as("dirty_frac"),
        when(col("n_contaminated") === 0, "clean")
          .when(frac > dirtyAbove, "dirty")
          .otherwise("partial").as("bucket"))
  }
}
