package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, embarrassingly parallel — these run inside the
  * scan stage at any scale).
  */
object TextAnalysis {

  /** Occurrences of `marker` in `text` via the length-difference identity —
    * engine-portable (no regex dialect differences).
    */
  def markerCount(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) /
      lit(marker.length)).cast("int")

  /** Language-ID markers: one high-frequency function word per language.
    * An n-gram profile model would use many more markers; the shape —
    * score-per-language then argmax with a deterministic tiebreak — is the
    * same.
    */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ", "es" -> " el ", "de" -> " der ", "fr" -> " le ",
    "zh" -> "的")

  /** T1: heuristic language ID — argmax of marker scores, first-listed
    * language wins ties, 'und' when all scores are zero.
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (lang, m) =>
      lang -> markerCount(text, m) * lit(100) / lit(m.length)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** T2: quality features + a deterministic integer quality score
    * (length/punctuation/stopword heuristics, the usual pre-filter before
    * expensive pipeline stages).
    */
  def quality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t)
    val nWords = size(split(t, " "))
    val nPunct = markerCount(t, ".") + markerCount(t, ",") + markerCount(t, "!")
    val nStop = markerCount(t, " the ") + markerCount(t, " a ") +
      markerCount(t, " of ") + markerCount(t, " and ")
    df.withColumn("n_chars_c", nChars)
      .withColumn("n_words", nWords)
      .withColumn("n_punct", nPunct)
      .withColumn("n_stop", nStop)
      .withColumn("quality_score",
        when(nChars < 10, 0).otherwise(
          least(lit(100),
            lit(50) + nStop * lit(5) - nPunct * lit(2) +
              when(nWords >= 20, 10).otherwise(0))))
  }

  /** T3: token counts — whitespace tokens plus a BPE-ish subword estimate
    * (ceil(chars/4), the standard rough tokens-per-byte rule).
    */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), "\\s+")))
      .withColumn("subword_est", floor((length(col(textCol)) + lit(3)) / lit(4)).cast("int"))

  /** T4: content fingerprint of the normalized text (lowercase, trimmed) —
    * the dedup/bucketing key form of a rolling hash; md5 here so external
    * engines can reproduce it.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(text)).cast("binary"))

  /** T5: corpus-relative unigram log-probability — the order-1 form of
    * the LM-perplexity quality filter (CCNet-style): score each doc by
    * the mean ln(p(token)) under the corpus's own unigram distribution.
    * Gibberish and boilerplate-stuffed docs score far below fluent text
    * drawn from the corpus's vocabulary.
    *
    * Shape at scale: one map-side-combined groupBy for the unigram
    * counts, a broadcast-1-row cross for the total, one shuffle join of
    * the token stream against the vocab (vocab-sized right side — for a
    * web-scale corpus this is the big-small join AQE handles), one
    * per-doc aggregation. Scores are rounded to 4 places so the oracle's
    * differently-ordered float summation hashes identically (the d5
    * cosine precedent).
    */
  /** T6: PII scrubbing patterns — deliberately simple, dialect-portable
    * regexes (identical semantics under Java regex and RE2, so the
    * DuckDB oracle replays them verbatim). Real deployments swap in
    * their compliance patterns; the operator shape — count then replace,
    * all inside the scan stage — is the part that matters at scale.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    // URL before email: the email pattern matches userinfo/host segments
    // INSIDE a URL (https://user@host/x), so redacting emails first would
    // split the URL into "https://<EMAIL>/x". URL-first consumes the whole
    // URL before the email pattern sees it.
    ("url", "https?://[^ ]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
    ("phone", "[0-9]{3}-[0-9]{4}-[0-9]{4}", "<PHONE>"))

  /** T6: per-kind PII match counts plus the scrubbed text. Pure column
    * expressions — no shuffle, embarrassingly parallel, idempotent
    * (replacement tokens match none of the patterns).
    *
    * Counts are taken per-pattern over the ORIGINAL text, so one span can
    * legitimately count under two kinds (a URL with userinfo counts as
    * both url and email); the scrub itself applies patterns in
    * [[piiPatterns]] order and each span is replaced exactly once.
    */
  def redactPii(df: DataFrame, textCol: String = "text"): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (d, (kind, pat, _)) =>
      d.withColumn(s"n_$kind",
        regexp_count(col(textCol), lit(pat)).cast("int"))
    }
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, tok)) => regexp_replace(c, pat, tok)
    }
    counted.withColumn("redacted", redacted)
  }

  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol),
      explode(split(col(textCol), "\\s+")).as("w"))
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("total"))
    toks.join(freq, "w")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        round(avg(log(col("cnt").cast("double") / col("total"))), 4)
          .as("avg_logp"))
  }

  /** T7: intra-document repetition metrics (the Gopher/MassiveText
    * repetition filters, word-bigram form): per document, the total and
    * distinct bigram counts, the occupancy of the single most frequent
    * bigram, and the mass sitting in repeated bigrams. High
    * top-bigram/duplicate mass flags boilerplate and degenerate
    * generation loops — a standard pretraining quality signal alongside
    * [[qualityScore]]'s length/punct/stopword stats. Counts are emitted
    * as integers (ratios are derivable) so the oracle hash-compare never
    * rides on float formatting.
    *
    * Shape: explode bigrams → two-level hash aggregate. Both shuffles
    * key on doc_id(+gram), so at 100 TB this is embarrassingly
    * data-parallel with map-side partial aggregation; nothing is
    * corpus-global. Docs with fewer than two tokens come back with all
    * zeros via the left join (explode of an empty array emits no rows).
    */
  def repetition(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = df.select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(when(size(col("w")) >= 2,
          expr("transform(sequence(0, size(w)-2), " +
            "i -> concat(w[i], ' ', w[i+1]))"))
        .otherwise(array().cast("array<string>"))).as("g"))
    val perDoc = grams.groupBy(col(idCol), col("g"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).cast("int").as("n_bigrams"),
        count(lit(1)).cast("int").as("n_distinct"),
        max(col("n")).cast("int").as("top_n"),
        coalesce(sum(when(col("n") > 1, col("n"))), lit(0)).cast("int")
          .as("dup_n"))
    df.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("n_distinct"), lit(0)).as("n_distinct"),
        coalesce(col("top_n"), lit(0)).as("top_n"),
        coalesce(col("dup_n"), lit(0)).as("dup_n"))
  }

  /** T12: per-document average bigram conditional log-probability under
    * the corpus bigram model — ln(count(w1 w2) / count(w1 ·)) averaged
    * over the document's bigrams. The order-2 sibling of
    * [[unigramLogProb]]'s quality signal: degenerate or boilerplate text
    * scores high (its bigrams dominate their contexts), natural text
    * lower — the cheap LM-perplexity stand-in when no trained LM is in
    * the loop. Same shape class as t5: explode, two corpus aggregates
    * (the bigram and context tables), broadcast-joinable back over the
    * stream, one final per-doc aggregate; nothing all-pairs. Docs with
    * fewer than two tokens produce no bigrams and drop out, same as
    * t5's empty docs.
    */
  def bigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val grams = df.select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(when(size(col("w")) >= 2,
          expr("transform(sequence(0, size(w)-2), " +
            "i -> concat(w[i], ' ', w[i+1]))"))
        .otherwise(array().cast("array<string>"))).as("g"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
    val cb = grams.groupBy(col("g")).agg(count(lit(1)).as("cb"))
    val cu = grams.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    grams.join(cb, "g").join(cu, "w1")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        round(avg(log(col("cb").cast("double") / col("cu"))), 4)
          .as("avg_logp"))
  }

  /** T16: per-group character-distribution KL divergence against the
    * corpus — the distribution-drift detector a curation pipeline runs
    * per source/language shard (a shard whose letter histogram diverges
    * hard from the corpus is mis-tagged, mojibake, or boilerplate).
    * Restricted to [a-z] after lowercasing so the support is a fixed
    * 26-char alphabet: every count is an exact BIGINT from one
    * explode+groupBy, the corpus marginal is a broadcast scalar join,
    * and KL = Σ p·ln(p/q) sums ≤26 DOUBLE terms per group — inside the
    * gate's 10-significant-digit normalization regardless of sum order.
    * Groups with no [a-z] mass (fully non-Latin shards) drop out rather
    * than emit 0/0.
    */
  def charKl(df: DataFrame, groupCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val chars = df.select(col(groupCol).as("grp"),
        explode(split(regexp_replace(lower(col(textCol)), "[^a-z]", ""), ""))
          .as("c"))
      .filter(col("c") =!= "")
    val lc = chars.groupBy(col("grp"), col("c"))
      .agg(count(lit(1)).as("n_lc"))
    val perGrp = lc.groupBy(col("grp")).agg(sum(col("n_lc")).as("n_l"))
    val perChar = lc.groupBy(col("c")).agg(sum(col("n_lc")).as("n_c"))
    val total = perChar.agg(sum(col("n_c")).as("n"))
    lc.join(perGrp, "grp").join(perChar, "c")
      .crossJoin(broadcast(total))
      .withColumn("term",
        (col("n_lc").cast("double") / col("n_l")) *
          log((col("n_lc").cast("double") / col("n_l")) /
            (col("n_c").cast("double") / col("n"))))
      .groupBy(col("grp"))
      .agg(max(col("n_l")).as("n_chars"), sum(col("term")).as("kl"))
  }

  /** Vocabulary-growth (lexical diversity) curve: for each document in
    * id order, how many corpus-NEW distinct word trigrams it introduces
    * (`n_new` — its first-occurrence count) and the cumulative corpus
    * vocabulary after it (`n_new_cum`). The curation ablation signal
    * behind "is more of this source still adding diversity?": a source
    * whose curve flattens is repeating itself, and the marginal docs
    * are dedup/prune candidates.
    *
    * Scale shape: one shingle explode → min(doc_id) per distinct
    * trigram (fixed-width keys, map-side combined) → doc-keyed count →
    * the distributed two-pass prefix sum ([[graft.operators.PrefixSum]]
    * — never the single-task `sum().over(Window.orderBy)` cliff).
    * Shingling reuses [[Dedup.shingles]] (k-word windows; short docs
    * contribute their whole text), so the vocabulary this curve counts
    * is exactly the one d2's near-dup pipeline indexes.
    */
  def vocabGrowth(docs: DataFrame, shingleLen: Int = 3,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(array_distinct(Dedup.shingles(col(textCol), shingleLen)))
        .as("g"))
    val firstSeen = grams.groupBy(col("g")).agg(min(col(idCol)).as(idCol))
    val perDoc = firstSeen.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_new"))
    val all = docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_new"), lit(0L)).as("n_new"))
    graft.operators.PrefixSum.running(all, Seq(col(idCol)), Seq("n_new"))
  }

  /** D41: CCNet-style perplexity bucketing (Wenzek et al. 2020 — the
    * head/middle/tail split CCNet and its descendants cut web data by):
    * every document's corpus-bigram-LM fluency ([[bigramLogProb]] — the
    * stand-in for CCNet's KenLM; perplexity = exp(−avg_logp), so
    * ranking on avg_logp DESCENDING is ranking on perplexity ascending
    * with no float exp anywhere) is ranked corpus-wide and tertiled:
    * `head` = the most fluent third, `tail` = the least; CCNet trains
    * on head+middle, so `keep = bucket ≠ 'tail'`.
    *
    * Scale shape: the per-doc LM scores are [[bigramLogProb]]'s two
    * token-keyed aggregates; the corpus-wide ordering runs through the
    * distributed two-pass rank ([[graft.operators.GlobalRank]] — never
    * the single-task `row_number().over(Window.orderBy)` cliff), and
    * the tertile thresholds compare against one broadcast scalar count.
    * Ranked on (round-4 avg_logp, id) — total order, engine-exact.
    * Documents with no bigram (< 2 tokens) have no LM score and are
    * out of scope here — the length gates (t2/t20) own them.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // Cached (the d32 artifact discipline): the LM score table feeds the
    // rank pass AND the tertile count — uncached, each consumer re-runs
    // the two token-keyed LM aggregates over the corpus.
    val lp = graft.CacheRegistry.register(
      bigramLogProb(docs, idCol, textCol).cache())
    val ranked = graft.operators.GlobalRank.rowNumber(
      lp, Seq(col("avg_logp").desc, col(idCol)), "rn")
    val tot = lp.agg(count(lit(1)).as("n_docs"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("bucket",
        when(col("rn") * 3 <= col("n_docs"), "head")
          .when(col("rn") * 3 <= col("n_docs") * 2, "middle")
          .otherwise("tail"))
      .withColumn("keep", col("bucket") =!= "tail")
      .select(col(idCol), col("n_bigrams"), col("avg_logp"),
        col("rn"), col("bucket"), col("keep"))
  }

  /** T24: the Gopher REPETITION rule battery (Rae et al. 2021 §A1.1's
    * other half — [[gopherRules]] covers the outlier rules): documents
    * whose content is dominated by repeated n-grams carry little
    * training signal and skew the loss. Per document:
    *
    *  - `top{2,3,4}_frac`: the fraction of the document's n-grams
    *    taken by its single most frequent n-gram (ties break on gram
    *    text for determinism) — Gopher bounds these at 0.20/0.18/0.16;
    *  - `dup5_cover_frac`: the fraction of TOKENS covered by 5-gram
    *    windows that repeat WITHIN the document (the intra-doc form of
    *    [[Dedup.dupSpans]]' islands — coverage, not window counts, so
    *    overlapping repeats aren't double-counted: the merge is
    *    [[Dedup.coverSpans]], which also collapses non-adjacent but
    *    coverage-overlapping repeats), bounded at 0.15.
    *
    * `keep` is the conjunction. Scale shape: three (doc, gram) counts
    * with map-side combine + doc-keyed max/sum rollups; the coverage
    * term windows by document for the island merge ([[Dedup.coverSpans]]
    * partitioned per doc). Documents shorter than an n-gram length pass
    * that rule vacuously (no n-gram exists to repeat).
    */
  def gopherRepetitionRules(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def topFrac(n: Int, out: String): DataFrame =
      docs.select(col(idCol), Dedup.words(col(textCol)).as("w"))
        .filter(size(col("w")) >= n)
        .select(col(idCol), explode(expr(
          s"transform(sequence(0, size(w) - $n), " +
            s"i -> concat_ws(' ', slice(w, i + 1, $n)))")).as("g"))
        .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col(idCol))
        .agg((max(col("c")).cast("double") / sum(col("c"))).as(out))
    val wins = Dedup.tokenWindows(docs, 5, idCol, textCol)
    val dupIn = wins.groupBy(col(idCol), col("h"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col(idCol), col("h"))
    val cover = Dedup.coverSpans(
        wins.join(dupIn, Seq(idCol, "h")), 5, idCol)
      .groupBy(col(idCol))
      .agg(sum(col("span_end") - col("span_start") + 1).as("covered"))
    docs.select(col(idCol), size(Dedup.words(col(textCol))).as("n_tokens"))
      .join(topFrac(2, "t2f"), Seq(idCol), "left")
      .join(topFrac(3, "t3f"), Seq(idCol), "left")
      .join(topFrac(4, "t4f"), Seq(idCol), "left")
      .join(cover, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        round(coalesce(col("t2f"), lit(0.0)), 6).as("top2_frac"),
        round(coalesce(col("t3f"), lit(0.0)), 6).as("top3_frac"),
        round(coalesce(col("t4f"), lit(0.0)), 6).as("top4_frac"),
        round(coalesce(col("covered"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup5_cover_frac"))
      .withColumn("ok_top2", col("top2_frac") <= 0.2)
      .withColumn("ok_top3", col("top3_frac") <= 0.18)
      .withColumn("ok_top4", col("top4_frac") <= 0.16)
      .withColumn("ok_dup5", col("dup5_cover_frac") <= 0.15)
      .withColumn("keep", col("ok_top2") && col("ok_top3") &&
        col("ok_top4") && col("ok_dup5"))
  }

  /** Stop words for the [[gopherRules]] battery — the high-frequency
    * function words of Rae et al. 2021's rule 8, intersected with this
    * corpus's vocabulary convention (lowercase, unpunctuated).
    */
  val gopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a")

  /** T20: the Gopher quality-rule battery (Rae et al. 2021 §A1.1, the
    * rule set reused by MassiveText/RefinedWeb/Dolma) — per-document
    * boolean gates, not a blended score (that is [[quality]]):
    *
    *  1. word count in [`minWords`, `maxWords`];
    *  2. mean word length in [3, 10] characters;
    *  3. symbol-to-word ratio ≤ 0.1 (`#` and `...`);
    *  4. ≥ 80% of words contain at least one alphabetic character;
    *  5. at least 2 distinct stop words present ([[gopherStopWords]]).
    *
    * (The bullet/ellipsis LINE rules don't apply — this corpus is
    * single-line by construction; see chunk-level boilerplate handling
    * in [[Dedup.chunkShared]]/[[Dedup.chunkScrub]] instead.) `keep` is
    * the conjunction. All pure column expressions over the token array —
    * zero shuffles, the whole battery runs inside the scan's codegen
    * stage at any corpus size.
    */
  def gopherRules(df: DataFrame, minWords: Int = 50,
      maxWords: Int = 100000, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val padded = concat(lit(" "), t, lit(" "))
    val nWords = size(split(t, "\\s+"))
    val totChars = expr(
      s"aggregate(transform(split($textCol, '\\\\s+'), x -> length(x)), " +
        "0, (a, x) -> a + x)")
    val nAlpha = expr(
      s"aggregate(transform(split($textCol, '\\\\s+'), " +
        "x -> CASE WHEN x rlike '[A-Za-z]' THEN 1 ELSE 0 END), " +
        "0, (a, x) -> a + x)")
    val nSymbols = markerCount(t, "#") + markerCount(t, "...")
    val nStopKinds = gopherStopWords
      .map(sw => when(markerCount(padded, s" $sw ") > 0, 1).otherwise(0))
      .reduce(_ + _)
    df.select(col(idCol),
        nWords.as("n_words"),
        round(totChars.cast("double") / nWords, 6).as("mean_wlen"),
        round(nSymbols.cast("double") / nWords, 6).as("symbol_ratio"),
        round(nAlpha.cast("double") / nWords, 6).as("alpha_frac"),
        nStopKinds.cast("int").as("n_stop_kinds"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_wlen", col("mean_wlen") >= 3 && col("mean_wlen") <= 10)
      .withColumn("ok_symbols", col("symbol_ratio") <= 0.1)
      .withColumn("ok_alpha", col("alpha_frac") >= 0.8)
      .withColumn("ok_stop", col("n_stop_kinds") >= 2)
      .withColumn("keep",
        col("ok_words") && col("ok_wlen") && col("ok_symbols") &&
          col("ok_alpha") && col("ok_stop"))
  }
}
