package graft.queries

import graft.Tables
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal) as gate queries. Approximate operators
  * (MinHash-LSH, SimHash, LSH-ANN) have no SQL oracle — they get rows-only
  * checks here and planted-duplicate assertions in PipelineSpec; the exact
  * operators (exact dedup, n-gram Jaccard, cosine pairs, brute-force ANN,
  * all text stats) hash-match DuckDB.
  */
object PipelineQueries {

  /** D1: exact dedup by content hash. */
  def d1DedupExact(spark: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(spark, d)).orderBy(col("keep_id"))

  /** D2: MinHash+LSH near-dup candidate pairs (approximate; rows-only). */
  def d2MinhashLsh(spark: SparkSession, d: String): DataFrame =
    Dedup.minHashLsh(Tables.documents(spark, d), threshold = 0.2)
      .orderBy(col("doc_a"), col("doc_b"))

  /** D3: SimHash pairs within source blocks (approximate; rows-only). */
  def d3Simhash(spark: SparkSession, d: String): DataFrame =
    Dedup.simHash(Tables.documents(spark, d), blockCol = "source",
        maxHamming = 16)
      .orderBy(col("doc_a"), col("doc_b"))

  /** D4: exact word-set Jaccard pairs within source blocks. Outputs the
    * integer intersection/union sizes (engine-stable, no float hashing).
    */
  def d4NgramJaccard(spark: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccard(Tables.documents(spark, d), blockCol = "source",
        threshold = 0.9)
      .orderBy(col("doc_a"), col("doc_b"))

  /** D5: exact embedding-cosine near-dup pairs within label blocks. */
  def d5EmbedCosine(spark: SparkSession, d: String): DataFrame =
    Similarity.cosinePairs(Tables.embeddings(spark, d), blockCol = "label",
        threshold = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))

  /** ANN baseline: exact brute-force cosine top-10 for query vector 0. */
  def annTopk(spark: SparkSession, d: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(spark, d), queryId = 0L, k = 10)

  /** ANN scale path: multi-probe LSH top-10. The synthetic corpus is
    * near-uniform (true top-10 sims ≈ 0.3), so the probe radius must be
    * wide over a small grid to hold recall@10 ≥ 0.8 — 2^4 buckets, probe
    * Hamming ≤ 2 (11/16 of buckets). A clustered real-embedding corpus
    * inverts that: 16-24 planes, radius 1, and the same plan prunes hard.
    * Recall is gated by `ann_lsh_recall`.
    */
  def annLshTopk(spark: SparkSession, d: String): DataFrame =
    Similarity.lshBucketTopK(Tables.embeddings(spark, d), queryId = 0L, k = 10,
      numPlanes = 4, probeHamming = 2)

  /** ANN scale path 2: IVF — learned k-means clusters instead of random
    * hyperplanes, probing the 4 nearest of 8 cells (recall gated by
    * `ann_ivf_recall`; near-uniform corpus needs half the cells — see
    * [[annLshTopk]]).
    */
  def annIvfTopk(spark: SparkSession, d: String): DataFrame =
    Similarity.ivfTopK(Tables.embeddings(spark, d), queryId = 0L, k = 10,
      nClusters = 8, nProbe = 4)

  /** ANN quality gates: recall@10 of each approximate path against the
    * exact baseline, computed in-engine. Deterministic (seeded hyperplanes
    * / seeded k-means over the same input), so the oracle pins the
    * measured value — moving both approximate paths from rows-only checks
    * to hash-checked gates.
    */
  def annLshRecall(spark: SparkSession, d: String): DataFrame =
    Similarity.recallAtK(annTopk(spark, d), annLshTopk(spark, d), "lsh")

  def annIvfRecall(spark: SparkSession, d: String): DataFrame =
    Similarity.recallAtK(annTopk(spark, d), annIvfTopk(spark, d), "ivf")

  /** T1: heuristic language ID per document. */
  def t1LangId(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang"))
      .orderBy(col("doc_id"))

  /** T2: quality features + score. */
  def t2Quality(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.quality(Tables.documents(spark, d))
      .select(col("doc_id"), col("n_words"), col("n_punct"), col("n_stop"),
        col("quality_score"))
      .orderBy(col("doc_id"))

  /** T3: corpus token counts per language. */
  def t3Tokens(spark: SparkSession, d: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(spark, d))
      .groupBy(col("lang"))
      .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("subword_est")).as("total_subword_est"),
        count(lit(1)).as("docs"))
      .orderBy(col("lang"))

  /** T4: normalized-content fingerprint. */
  def t4Fingerprint(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** MM1: multimodal metadata surface (binary payload + typed metadata). */
  def mm1Meta(spark: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(spark, d)
      .select(col("doc_id"), length(col("media")).as("n_bytes"), col("width"),
        col("height"), col("fmt"))
      .orderBy(col("doc_id"))

  /** MM2: stubbed decode + feature extraction via per-partition batches.
    * The gate projects hash-stable scalars — payload size plus the exact
    * per-block byte sums as one comma-joined string (the float means are
    * `sums / block_len`, verified transitively; raw float arrays are not
    * engine-hashable and crash the driver's pandas compare).
    */
  def mm2Features(spark: SparkSession, d: String): DataFrame =
    Multimodal.fakeDecodeFeatures(Multimodal.mediaTable(spark, d))
      .select(col("doc_id"), col("n_bytes"),
        concat_ws(",", col("block_sums").cast("array<string>")).as("block_sums"))
      .orderBy(col("doc_id"))

  /** MM3: frame-sampling chunk counts (the chunk fingerprints themselves
    * are engine-specific xxhash64 — the count is oracle-checked).
    */
  def mm3Frames(spark: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(spark, d)
      .select(col("doc_id"),
        size(Multimodal.frameSample(col("media"), 64)).as("n_frames"))
      .orderBy(col("doc_id"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact" -> d1DedupExact,
    "d2_minhash_lsh" -> d2MinhashLsh,
    "d3_simhash" -> d3Simhash,
    "d4_ngram_jaccard" -> d4NgramJaccard,
    "d5_embed_cosine" -> d5EmbedCosine,
    "ann_topk" -> annTopk,
    "ann_lsh_topk" -> annLshTopk,
    "ann_ivf_topk" -> annIvfTopk,
    "ann_lsh_recall" -> annLshRecall,
    "ann_ivf_recall" -> annIvfRecall,
    "t1_langid" -> t1LangId,
    "t2_quality" -> t2Quality,
    "t3_tokens" -> t3Tokens,
    "t4_fingerprint" -> t4Fingerprint,
    "mm1_meta" -> mm1Meta,
    "mm2_features" -> mm2Features,
    "mm3_frames" -> mm3Frames)

  private val langScoreSql =
    """SELECT doc_id,
      |  CAST((len(text) - len(replace(text, ' the ', ''))) / 5 AS INT) * 100 / 5.0 AS s_en,
      |  CAST((len(text) - len(replace(text, ' el ', ''))) / 4 AS INT) * 100 / 4.0 AS s_es,
      |  CAST((len(text) - len(replace(text, ' der ', ''))) / 5 AS INT) * 100 / 5.0 AS s_de,
      |  CAST((len(text) - len(replace(text, ' le ', ''))) / 4 AS INT) * 100 / 4.0 AS s_fr,
      |  CAST((len(text) - len(replace(text, '的', ''))) / 1 AS INT) * 100 / 1.0 AS s_zh
      |FROM documents""".stripMargin

  val oracles: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS dups FROM documents
        |GROUP BY sha256(text) ORDER BY keep_id""".stripMargin,
    "d4_ngram_jaccard" ->
      """WITH sets AS (
        |  SELECT source, doc_id, list_distinct(string_split(text, ' ')) AS ws
        |  FROM documents
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  len(list_intersect(a.ws, b.ws))::INT AS inter,
        |  len(list_distinct(list_concat(a.ws, b.ws)))::INT AS uni
        |FROM sets a JOIN sets b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.ws, b.ws))::DOUBLE /
        |      len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9
        |ORDER BY doc_a, doc_b""".stripMargin,
    "d5_embed_cosine" ->
      """WITH v AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
        |)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_cosine_similarity(a.e, b.e), 4) AS sim
        |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.e, b.e) >= 0.4
        |ORDER BY vec_a, vec_b""".stripMargin,
    "ann_topk" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
        |), q AS (SELECT e FROM v WHERE vec_id = 0)
        |SELECT v.vec_id, round(list_cosine_similarity(v.e, q.e), 4) AS sim
        |FROM v, q WHERE v.vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    // Determinism pins: recall@10 is measured in-engine against the exact
    // baseline (seeded hyperplanes / seeded k-means over the same single
    // parquet split — verified stable across SPARK_GRAFT_CPUS 4/8/16), so
    // the oracle pins the deterministic value at the gate scale. The ≥0.8
    // quality floor itself is asserted in PipelineSpec.
    "ann_lsh_recall" ->
      "SELECT 'lsh' AS method, 10 AS k, CAST(0.9 AS DOUBLE) AS recall",
    "ann_ivf_recall" ->
      "SELECT 'ivf' AS method, 10 AS k, CAST(0.8 AS DOUBLE) AS recall",
    "t1_langid" ->
      s"""WITH s AS ($langScoreSql),
        |b AS (SELECT *, greatest(s_en, s_es, s_de, s_fr, s_zh) AS best FROM s)
        |SELECT doc_id,
        |  CASE WHEN s_en = best AND best > 0 THEN 'en'
        |       WHEN s_es = best AND best > 0 THEN 'es'
        |       WHEN s_de = best AND best > 0 THEN 'de'
        |       WHEN s_fr = best AND best > 0 THEN 'fr'
        |       WHEN s_zh = best AND best > 0 THEN 'zh'
        |       ELSE 'und' END AS pred_lang
        |FROM b ORDER BY doc_id""".stripMargin,
    "t2_quality" ->
      """SELECT doc_id,
        |  len(string_split(text, ' '))::INT AS n_words,
        |  CAST((len(text) - len(replace(text, '.', ''))) / 1 AS INT)
        |    + CAST((len(text) - len(replace(text, ',', ''))) / 1 AS INT)
        |    + CAST((len(text) - len(replace(text, '!', ''))) / 1 AS INT) AS n_punct,
        |  CAST((len(text) - len(replace(text, ' the ', ''))) / 5 AS INT)
        |    + CAST((len(text) - len(replace(text, ' a ', ''))) / 3 AS INT)
        |    + CAST((len(text) - len(replace(text, ' of ', ''))) / 4 AS INT)
        |    + CAST((len(text) - len(replace(text, ' and ', ''))) / 5 AS INT) AS n_stop,
        |  CASE WHEN len(text) < 10 THEN 0 ELSE least(100,
        |    50 + 5 * (CAST((len(text) - len(replace(text, ' the ', ''))) / 5 AS INT)
        |      + CAST((len(text) - len(replace(text, ' a ', ''))) / 3 AS INT)
        |      + CAST((len(text) - len(replace(text, ' of ', ''))) / 4 AS INT)
        |      + CAST((len(text) - len(replace(text, ' and ', ''))) / 5 AS INT))
        |    - 2 * (CAST((len(text) - len(replace(text, '.', ''))) / 1 AS INT)
        |      + CAST((len(text) - len(replace(text, ',', ''))) / 1 AS INT)
        |      + CAST((len(text) - len(replace(text, '!', ''))) / 1 AS INT))
        |    + CASE WHEN len(string_split(text, ' ')) >= 20 THEN 10 ELSE 0 END)::INT
        |  END AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_tokens" ->
      """SELECT lang,
        |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum((len(text) + 3) // 4) AS BIGINT) AS total_subword_est,
        |  count(*) AS docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
        |ORDER BY doc_id""".stripMargin,
    "mm1_meta" ->
      """SELECT doc_id, octet_length(encode(text))::INT AS n_bytes,
        |  CAST(64 + doc_id % 64 AS INT) AS width,
        |  CAST(48 + doc_id % 48 AS INT) AS height,
        |  'fake/raw' AS fmt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm2_features" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |         octet_length(encode(text))::INT AS n
        |  FROM documents
        |)
        |SELECT doc_id, n AS n_bytes,
        |  array_to_string(
        |    list_transform(range(0, 8), j ->
        |      list_sum(list_transform(
        |        range(j*n//8, greatest(j*n//8 + 1, (j+1)*n//8)),
        |        i -> 16*(strpos('0123456789ABCDEF', h[2*i+1]) - 1)
        |             + strpos('0123456789ABCDEF', h[2*i+2]) - 1))::VARCHAR),
        |    ',') AS block_sums
        |FROM b ORDER BY doc_id""".stripMargin,
    "mm3_frames" ->
      """SELECT doc_id,
        |  ((octet_length(encode(text))::INT - 1) // 64 + 1)::INT AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin)
}
