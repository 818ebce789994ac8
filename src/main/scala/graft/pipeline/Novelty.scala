package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Batch-vs-corpus novelty: which incoming documents are NOT already in
  * the reference corpus (by fingerprint)? The exact answer is an
  * anti-join — but at 100 TB the corpus side of that join is the
  * warehouse, and shuffling it per batch is the whole cost. This
  * operator is the approximate-prefilter + exact-verify form:
  *
  *   1. ONE corpus pass folds every fingerprint into a Bloom filter via
  *      Spark's own `BloomFilterAggregate` (the expression behind AQE
  *      runtime filters — built distributed with map-side register
  *      merges, fixed size regardless of corpus rows; it reaches the
  *      executors as a scalar-subquery literal, never a shuffle).
  *   2. The batch probes the filter with `BloomFilterMightContain`.
  *      "No" is definitive (Bloom filters have no false negatives) —
  *      those rows are novel with zero join work.
  *   3. Only the "maybe" rows — true duplicates plus the fpp tail —
  *      are verified exactly: their fingerprints broadcast into a
  *      semi-join that filters a column-pruned corpus scan down to the
  *      actually-hit fingerprints, and an anti-join against that tiny
  *      hit set settles the batch. The corpus is scanned, never
  *      shuffled; everything that moves is maybe-sized.
  *
  * The result is EXACTLY the anti-join's (the gate pins it against a
  * NOT EXISTS oracle); the Bloom path only relocates work. Neither
  * bloom function is SQL-registered in Spark 4 — both are exposed here
  * through `createOrReplaceTempFunction`, the same route as the
  * project's own codegen expressions; `might_contain` requires its
  * filter as a scalar subquery, hence the temp-view plumbing.
  */
object Novelty {

  private val seq = new AtomicLong()

  private def registerBloom(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_build",
      exprs => new BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
        .toAggregateExpression(), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain",
      exprs => BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
  }

  /** Rows of `batch` whose `fpCol` value appears nowhere in `corpus`'s
    * `fpCol`. Size the filter: `expectedItems` ≈ corpus distinct
    * fingerprints, `numBits` ≈ 10× that for ~1% fpp (fpp only moves
    * cost, never correctness).
    */
  def novelAgainst(batch: DataFrame, corpus: DataFrame, fpCol: String,
      expectedItems: Long, numBits: Long): DataFrame = {
    val spark = batch.sparkSession
    registerBloom(spark)
    val t = seq.incrementAndGet()
    corpus.select(col(fpCol)).createOrReplaceTempView(s"__graft_nov_c$t")
    spark.sql(
      s"""SELECT graft_bloom_build(xxhash64(`$fpCol`),
         |  ${expectedItems}L, ${numBits}L) AS f
         |FROM __graft_nov_c$t""".stripMargin)
      .createOrReplaceTempView(s"__graft_nov_f$t")
    batch.createOrReplaceTempView(s"__graft_nov_b$t")
    val probed = spark.sql(
      s"""SELECT *, graft_bloom_might_contain(
         |  (SELECT f FROM __graft_nov_f$t), xxhash64(`$fpCol`)) AS __maybe
         |FROM __graft_nov_b$t""".stripMargin)
    // Plans are fully resolved at this point; drop the plumbing views so
    // repeated calls (bench iterations) don't grow the session catalog.
    Seq(s"__graft_nov_c$t", s"__graft_nov_f$t", s"__graft_nov_b$t")
      .foreach(spark.catalog.dropTempView)
    val definite = probed.filter(!col("__maybe")).drop("__maybe")
    val maybes = probed.filter(col("__maybe")).drop("__maybe")
    // Exact verify, corpus-scan-shaped: hit fingerprints = corpus
    // semi-joined against the broadcast maybe set (tiny), then the
    // maybes anti-join that hit set (tiny, broadcast again).
    val hitFps = corpus.select(col(fpCol))
      .join(broadcast(maybes.select(col(fpCol)).distinct()),
        Seq(fpCol), "left_semi")
      .distinct()
    definite.unionByName(
      maybes.join(broadcast(hitFps), Seq(fpCol), "left_anti"))
  }
}
