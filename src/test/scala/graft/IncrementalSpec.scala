package graft

import graft.operators.AggMerge
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the incremental-maintenance operators: AggMerge's
  * delta-merge ≡ recompute contract (including retraction and group
  * death) and the incremental near-dup probe's batch×corpus-only
  * candidate space + exact-duplicate guarantee.
  */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def aggOf(rows: Seq[(String, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))

  test("merge of base + inserts - deletes equals recompute") {
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 3) {
      val base = Seq.fill(200)((s"k${rnd.nextInt(8)}", rnd.nextInt(100).toLong))
      val ins = Seq.fill(60)((s"k${rnd.nextInt(8)}", rnd.nextInt(100).toLong))
      val del = rnd.shuffle(base).take(50)
      val merged = AggMerge.merge(
        Seq(aggOf(base), aggOf(ins), AggMerge.retract(aggOf(del), Seq("k"))),
        Seq("k"), "n")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = aggOf(base.diff(del) ++ ins)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(merged == want, "delta-merge diverged from recompute")
    }
  }

  test("a fully-deleted group disappears from the merged view") {
    val base = Seq(("dead", 5L), ("dead", 7L), ("live", 1L))
    val merged = AggMerge.merge(
      Seq(aggOf(base),
        AggMerge.retract(aggOf(Seq(("dead", 5L), ("dead", 7L))), Seq("k"))),
      Seq("k"), "n")
    assert(merged.select("k").as[String].collect().toSeq == Seq("live"))
  }

  test("mismatched part schemas are rejected") {
    val a = aggOf(Seq(("x", 1L)))
    val b = a.withColumnRenamed("sv", "other")
    intercept[IllegalArgumentException] {
      AggMerge.merge(Seq(a, b), Seq("k"), "n")
    }
  }

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("join-view delta maintenance equals the monolithic recompute") {
    val sf = "/root/testdata/sf0.001"
    val incremental = graft.queries.MutQueries
      .m12JoinDelta(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val full = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incremental == full)
    // The delta slice must be non-empty, else the gate degenerates.
    assert(o.filter(col("o_orderkey") % 97 === 0).count() > 0)
  }

  test("scd2 lookup resolves the latest version at or before each fact") {
    val sf = "/root/testdata/sf0.001"
    val e = Tables.events(spark, sf)
    val versions = e.filter(col("event_type") === "view")
      .select(col("user_id"), unix_millis(col("ts")), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val got = graft.queries.RelQueries.j18Scd2Lookup(spark, sf)
      .select(col("event_id"), col("version_id")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    facts.foreach { case (fid, user, fts) =>
      val eligible = versions.filter(v => v._1 == user && v._2 <= fts)
      val want =
        if (eligible.isEmpty) None
        else Some(eligible.maxBy(v => (v._2, v._3))._3)
      assert(got(fid) == want, s"fact $fid resolved wrong version")
    }
  }

  test("incremental near-dup finds exact duplicates across the split") {
    val corpus = docs(1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six seven")
    val batch = docs(10L -> "alpha beta gamma delta epsilon zeta",
      11L -> "totally unrelated content words here now")
    val got = Dedup.incrementalNearDup(corpus, batch, threshold = 0.5)
      .select("batch_doc", "corpus_doc").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L)))
  }

  test("candidates never include corpus-internal pairs") {
    // Two identical corpus docs would pair under full LSH; the
    // incremental probe must not emit them.
    val corpus = docs(1L -> "same words in this document exactly",
      2L -> "same words in this document exactly")
    val batch = docs(10L -> "different payload with no overlap at all")
    assert(Dedup.incrementalNearDup(corpus, batch, threshold = 0.1).count() == 0)
  }

  test("emitted pairs are a subset of the exact ground truth (precision 1)") {
    val corpus = docs(1L -> "a b c d e f g h", 2L -> "a b c d x y z w")
    val batch = docs(10L -> "a b c d e f g q")
    val got = Dedup.incrementalNearDup(corpus, batch,
      threshold = 0.1, numHashes = 64, bands = 32)
      .select("batch_doc", "corpus_doc").as[(Long, Long)].collect().toSet
    val want = Dedup.crossJaccardPairs(corpus, batch, threshold = 0.1)
      .as[(Long, Long)].collect().toSet
    // The exact-verify stage guarantees precision 1; the strong pair
    // (j = 6/10 vs doc 1) must also survive the banding.
    assert(got.subsetOf(want), s"false positives: ${got.diff(want)}")
    assert(got.contains((10L, 1L)))
  }

  test("near-dup index at rest: persisted probe equals fresh compute, artifact round-trips") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    // The planted hit is an exact copy of a real corpus doc (guaranteed
    // LSH collision); the other batch doc shares no vocabulary.
    val copied = corpus.orderBy(col("doc_id")).select("text")
      .head().getString(0)
    val batch = docs(
      9001L -> copied,
      9002L -> "completely novel words nothing shares these tokens")
    val path = java.nio.file.Files
      .createTempDirectory("neardup_idx").toString
    try {
      Dedup.saveNearDupIndex(corpus, path)
      graft.CacheRegistry.releaseAll()
      // The seeded MinHash kernel makes the artifact a pure function of
      // the corpus: reloaded buckets equal a fresh derivation exactly.
      val freshBuckets = Dedup.bandedBuckets(Dedup.shingleSets(corpus))
        .as[(Long, Int, Long)].collect().toSet
      val storedBuckets = spark.read.parquet(s"$path/buckets")
        .as[(Long, Int, Long)].collect().toSet
      assert(storedBuckets == freshBuckets, "index artifact drifted")
      // Probing the index at rest = probing the raw corpus, exactly
      // (pairs AND verified jaccard values).
      val fromIndex = Dedup.incrementalNearDupFromIndex(
          spark, path, batch, threshold = 0.1)
        .as[(Long, Long, Double)].collect().toSet
      graft.CacheRegistry.releaseAll()
      val fresh = Dedup.incrementalNearDup(corpus, batch, threshold = 0.1)
        .as[(Long, Long, Double)].collect().toSet
      assert(fromIndex == fresh, s"index $fromIndex vs fresh $fresh")
      // And the planted batch doc actually hits the corpus while the
      // novel one stays silent.
      assert(fromIndex.exists(_._1 == 9001L))
      assert(!fromIndex.exists(_._1 == 9002L))
      // Parameter drift must be an ERROR, never a silent mis-banding:
      // the artifact records (numHashes, bands, shingleLen) and the
      // probe validates its own arguments against them (r12 advice).
      val ex = intercept[IllegalArgumentException] {
        Dedup.incrementalNearDupFromIndex(
          spark, path, batch, numHashes = 64, bands = 16, threshold = 0.1)
      }
      assert(ex.getMessage.contains("incompatible"), ex.getMessage)
      val ex2 = intercept[IllegalArgumentException] {
        Dedup.incrementalNearDupFromIndex(
          spark, path, batch, shingleLen = 5, threshold = 0.1)
      }
      assert(ex2.getMessage.contains("shingleLen=5"), ex2.getMessage)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(path)).deleteRecursively()
    }
  }
}
