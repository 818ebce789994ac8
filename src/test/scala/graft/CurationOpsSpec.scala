package graft

import graft.pipeline.{Chunking, Mixing, Sampling}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 curation operators: sliding-window chunking, temperature
  * mixture weights, per-block token caps, and the watermark late-drop
  * batch twin. Each test pins the property the DuckDB gate cannot see
  * from one fixed corpus (coverage/overlap invariants, limit behavior,
  * plan shape).
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsOf(texts: Seq[String]) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def collectLeaves(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectLeaves(a.executedPlan)
    case other => other +: other.children.flatMap(collectLeaves)
  }

  test("chunking covers every token exactly and respects the overlap") {
    val rnd = new scala.util.Random(42)
    val texts = (0 until 50).map(_ =>
      Seq.fill(1 + rnd.nextInt(60))("w" + rnd.nextInt(9)).mkString(" "))
    val w = 16; val s = 12
    val rows = Chunking.slidingChunks(docsOf(texts), w, s)
      .select("doc_id", "chunk_idx", "n_tokens")
      .as[(Long, Int, Int)].collect().toSeq.groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val nt = t.split("\\s+").length
      val chunks = rows(i.toLong).sortBy(_._2)
      // Contiguous chunk ids from 0; expected count from the definition.
      assert(chunks.map(_._2) == chunks.indices)
      val expected =
        if (nt <= w) 1 else math.ceil((nt - w).toDouble / s).toInt + 1
      assert(chunks.size == expected, s"doc $i: nt=$nt")
      // Span [idx*s, idx*s + n) — union covers [0, nt), last ends at nt.
      chunks.foreach { case (_, idx, n) =>
        assert(n == math.min(w, nt - idx * s), s"doc $i chunk $idx")
        assert(n >= 1)
      }
      assert(chunks.last._2 * s + chunks.last._3 == nt,
        s"doc $i: final chunk must reach the end")
      // Consecutive chunks overlap by w - s tokens (full-width chunks).
      chunks.sliding(2).foreach {
        case Seq((_, i1, n1), (_, i2, _)) if n1 == w =>
          assert(i1 * s + n1 - i2 * s == w - s)
        case _ => ()
      }
    }
  }

  test("chunking is a pure map-side generator — no shuffle in the plan") {
    val df = Chunking.slidingChunks(docsOf(Seq.fill(8)("a b c d e")), 4, 2)
    val plan = df.queryExecution.executedPlan
    assert(!collectLeaves(plan).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "slidingChunks must not shuffle")
  }

  test("content-defined chunks: cover every token, re-synchronize after an edit") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(400)("w" + rnd.nextInt(50)).mkString(" ")
    def chunksOf(text: String): Seq[(Int, Int, String)] =
      Chunking.contentDefinedChunks(docsOf(Seq(text)))
        .select("chunk_idx", "n_tokens", "chunk_hash")
        .as[(Int, Int, String)].collect().toSeq.sortBy(_._1)
    val orig = chunksOf(base)
    // Coverage: contiguous ids from 0, token counts sum to the doc.
    assert(orig.map(_._1) == orig.indices)
    assert(orig.map(_._2).sum == 400)
    assert(orig.forall(_._2 >= 1))
    assert(orig.size > 10, "divisor 8 over 400 tokens must cut many chunks")
    // Shift invariance — THE property position-based chunking lacks:
    // prepend tokens and every chunk after the first re-synchronized
    // boundary hashes identically, so chunk-hash dedup still matches the
    // unedited remainder. The first boundary depends only on a k-gram
    // (k = 3), so at most the head chunk (plus the k-gram straddle) can
    // differ; compare as multisets of hashes.
    val edited = chunksOf("zzz qqq " + base)
    val origH = orig.map(_._3).groupBy(identity).view.mapValues(_.size).toMap
    val editH = edited.map(_._3).groupBy(identity).view.mapValues(_.size).toMap
    val shared = origH.map { case (h, n) => math.min(n, editH.getOrElse(h, 0)) }.sum
    assert(shared >= orig.size - 2,
      s"edit must only perturb the head chunk: ${orig.size} chunks, $shared survived")
    // Determinism under repartitioning (chunk identity is a pure function
    // of content).
    val repart = Chunking.contentDefinedChunks(
        docsOf(Seq(base)).repartition(7))
      .select("chunk_idx", "n_tokens", "chunk_hash")
      .as[(Int, Int, String)].collect().toSeq.sortBy(_._1)
    assert(repart == orig)
    // Map-side generator like slidingChunks: no shuffle.
    val plan = Chunking.contentDefinedChunks(docsOf(Seq(base)))
      .queryExecution.executedPlan
    assert(!collectLeaves(plan).exists(_.isInstanceOf[ShuffleExchangeExec]),
      "contentDefinedChunks must not shuffle")
  }

  test("mixture weights: alpha=1 is the natural distribution, sums hold") {
    val docs = Seq(
      ("en", Seq.fill(80)("w").mkString(" ")),
      ("en", Seq.fill(40)("w").mkString(" ")),
      ("de", Seq.fill(30)("w").mkString(" ")),
      ("fr", Seq.fill(10)("w").mkString(" "))
    ).toDF("lang", "text")
    val natural = Mixing.temperatureQuotas(docs, "lang", alpha = 1.0,
        budget = 1000L)
      .select("lang", "p_raw", "weight", "quota")
      .as[(String, Double, Double, Long)].collect().toSeq.sortBy(_._1)
    natural.foreach { case (l, p, wt, _) =>
      assert(math.abs(p - wt) < 1e-9, s"alpha=1 must keep $l at natural p")
    }
    assert(math.abs(natural.map(_._3).sum - 1.0) < 1e-6)
    // Quotas sum to the budget up to per-group rounding.
    assert(math.abs(natural.map(_._4).sum - 1000L) <= natural.size / 2 + 1)
    val en = natural.find(_._1 == "en").get
    assert(math.abs(en._2 - 0.75) < 1e-9) // 120 of 160 tokens
  }

  test("mixture weights: alpha<1 upsamples the tail, preserves order") {
    val docs = Seq(
      ("big", Seq.fill(900)("w").mkString(" ")),
      ("small", Seq.fill(100)("w").mkString(" "))
    ).toDF("lang", "text")
    val m = Mixing.temperatureQuotas(docs, "lang", alpha = 0.5,
        budget = 1000L)
      .select("lang", "p_raw", "weight").as[(String, Double, Double)]
      .collect().map { case (l, p, wt) => l -> ((p, wt)) }.toMap
    val (pBig, wBig) = m("big"); val (pSmall, wSmall) = m("small")
    assert(wSmall > pSmall, "tail group must gain weight")
    assert(wBig < pBig, "head group must shed weight")
    assert(wBig > wSmall, "smoothing must not invert the ranking")
  }

  test("token cap keeps an id-prefix per block and never starves a block") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 200).map { i =>
      (i.toLong, "s" + i % 7,
        Seq.fill(1 + rnd.nextInt(50))("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val budget = 120L
    val kept = Sampling.tokenCapPerGroup(docs, "source", budget)
      .select("doc_id", "source").as[(Long, String)].collect().toSeq
    val keptBy = kept.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val allBy = (0 until 200).groupBy(i => "s" + i % 7)
    allBy.foreach { case (src, ids) =>
      val k = keptBy.getOrElse(src, Set.empty)
      assert(k.nonEmpty, s"block $src must contribute at least one doc")
      // Prefix property: everything below the largest kept id is kept.
      val maxKept = k.max
      ids.filter(_ <= maxKept).foreach(i =>
        assert(k.contains(i.toLong), s"gap in $src at doc $i"))
    }
    // Budget bound, computed from the actual frame: prefix-before-last
    // of each block's kept set must be under budget.
    val withToks = docs
      .withColumn("toks", size(split(col("text"), "\\s+")).cast("long"))
      .select("doc_id", "source", "toks")
      .as[(Long, String, Long)].collect()
      .groupBy(_._2)
    withToks.foreach { case (src, rows) =>
      val keptIds = keptBy.getOrElse(src, Set.empty)
      val keptRows = rows.filter(r => keptIds.contains(r._1)).sortBy(_._1)
      val beforeLast = keptRows.dropRight(1).map(_._3).sum
      assert(beforeLast < budget, s"block $src exceeded the cap early")
      // And the first dropped doc (if any) would have crossed the budget.
      val dropped = rows.filter(r => !keptIds.contains(r._1)).sortBy(_._1)
      if (dropped.nonEmpty)
        assert(keptRows.map(_._3).sum >= budget,
          s"block $src dropped a doc while under budget")
    }
  }

  test("late-drop twin: an out-of-order event beyond the delay is dropped") {
    import java.sql.Timestamp
    def ts(min: Long, sec: Long = 0) =
      new Timestamp(1700000000000L + min * 60000L + sec * 1000L)
    // Arrival order = event_id. Event 3 is 30 min behind the running max
    // (dropped); event 4 is 5 min behind (kept, inside the 10 min delay).
    val events = Seq(
      (0L, ts(0), 1L, "a", 0.0, "{}"),
      (1L, ts(20), 1L, "a", 0.0, "{}"),
      (2L, ts(40), 1L, "a", 0.0, "{}"),
      (3L, ts(10), 1L, "a", 0.0, "{}"), // 30 min late vs hwm=40
      (4L, ts(35), 1L, "a", 0.0, "{}") // 5 min late: kept
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files
      .createTempDirectory("w3fixture").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.queries.StreamQueries.w3LateDrop(spark, dir)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.map(_._3).sum == 4, s"expected 4 survivors, got $out")
  }

  test("seeded shuffle: reproducible, seed-sensitive, contiguous shards") {
    val docs = docsOf((0 until 200).map(i => s"doc $i"))
    def run(seed: String) =
      Sampling.seededShuffle(docs, seed, shards = 4)
        .as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val a = run("s1")
    assert(a == run("s1"), "same seed must reproduce the permutation")
    assert(a != run("s2"), "a different seed must permute differently")
    // Every shard's positions are exactly 1..n (dense ranks, no holes).
    a.groupBy(_._2).foreach { case (shard, g) =>
      assert(g.map(_._3).sorted == (1 to g.size),
        s"shard $shard positions must be contiguous")
    }
    assert(a.map(_._1).distinct.size == 200, "every doc appears once")
  }

  test("winsorize caps only the tails; z-scores standardize per group") {
    val sf = "/root/testdata/sf0.001"
    val raw = Tables.events(spark, sf)
      .select(col("event_id"), col("value")).as[(Long, Double)]
      .collect().toMap
    val clipped = graft.queries.PipelineQueries
      .d20Winsorize(spark, sf).as[(Long, Double)].collect().toMap
    val changed = clipped.count { case (id, c) => c != raw(id) }
    assert(changed > 0 && changed < raw.size / 10,
      s"winsorize must touch only the tails (touched $changed)")
    val z = graft.queries.PipelineQueries.d21Zscore(spark, sf)
      .join(Tables.events(spark, sf).select(col("event_id"),
        col("event_type")), "event_id")
      .select(col("event_type"), col("z")).as[(String, Double)]
      .collect().toSeq
    z.groupBy(_._1).foreach { case (t, g) =>
      val vs = g.map(_._2)
      val m = vs.sum / vs.size
      val sd = math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (vs.size - 1))
      assert(math.abs(m) < 1e-9, s"$t z-mean must be ~0, got $m")
      assert(math.abs(sd - 1.0) < 1e-9, s"$t z-sd must be ~1, got $sd")
    }
  }

  test("text normalization is idempotent and canonical") {
    val out = graft.queries.PipelineQueries
      .t13Normalize(spark, "/root/testdata/sf0.001")
      .select(col("norm")).as[String].collect()
    out.foreach { s =>
      assert(!s.contains("  "), "no double spaces survive")
      assert(s == s.toLowerCase, "lowercased")
      assert(s == s.trim, "trimmed")
      assert(s.forall(c => c.isLetterOrDigit || c == ' '),
        "only alphanumerics and single spaces")
    }
  }

  test("hash split: stable membership under corpus growth") {
    val small = docsOf((0 until 100).map(i => s"doc $i"))
    val grown = docsOf((0 until 300).map(i => s"doc $i"))
    val before = Sampling.hashSplit(small, "graft42")
      .as[(Long, String)].collect().toMap
    val after = Sampling.hashSplit(grown, "graft42")
      .as[(Long, String)].collect().toMap
    before.foreach { case (id, split) =>
      assert(after(id) == split,
        s"doc $id must not migrate splits when the corpus grows")
    }
    // Fractions roughly honor 80/10/10 on the larger corpus.
    val counts = after.values.groupBy(identity).view.mapValues(_.size)
    assert(counts("train") > 200 && counts("train") < 280)
    assert(counts("val") + counts("test") > 20)
  }

  test("weighted sample: deterministic, k-bounded, weight-responsive") {
    val docs = docsOf((0 until 400).map(i => "w " * (i % 40 + 1)))
      .withColumn("n_chars", length(col("text")))
    def pick(seed: String) = Sampling
      .weightedTopK(docs, "n_chars", k = 30, seed = seed, idCol = "doc_id")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val a = pick("s1")
    assert(a == pick("s1"), "same seed must reproduce the sample")
    assert(a != pick("s2"), "different seeds must differ")
    assert(a.size == 30)
    // Weight-proportionality: across seeds, the mean weight of sampled
    // docs must exceed the corpus mean (long docs oversampled).
    val weights = docs.select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val corpusMean = weights.values.sum.toDouble / weights.size
    val sampleMean = (1 to 5).flatMap(i => pick(s"seed$i"))
      .map(weights(_)).sum.toDouble / (5 * 30)
    assert(sampleMean > corpusMean * 1.2,
      s"sample mean $sampleMean must exceed corpus mean $corpusMean")
  }

  test("inverted index: postings ascend, df counts them, index inverts") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.PipelineQueries
      .t14InvertedIndex(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (term, df, postings) =>
      val ids = postings.split(',').map(_.toLong)
      assert(ids.length == df, s"$term: df must equal posting length")
      assert(ids.sameElements(ids.sorted.distinct),
        s"$term: postings must be strictly ascending")
    }
    // Inversion: doc 0's terms each list doc 0 in their postings, and
    // terms absent from doc 0 never do.
    val doc0Terms = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).select(col("text"))
      .collect().head.getString(0).split("\\s+").filter(_.nonEmpty).toSet
    rows.foreach { case (term, _, postings) =>
      val hasDoc0 = postings.split(',').head == "0"
      assert(hasDoc0 == doc0Terms.contains(term),
        s"$term: posting membership must invert doc 0's term set")
    }
  }

  test("edit join: deletion neighborhoods cover exactly the ED<=1 pairs") {
    val names = Seq(
      "alpha",   // vs alXpha (insert), alpa (delete+subst? no: ED2), allha (subst)
      "alXpha",  // insert X into alpha -> ED 1
      "allha",   // substitute p->l     -> ED 1
      "alph",    // delete a            -> ED 1
      "alpa",    // delete h            -> ED 1 vs alpha; ED 2 vs alph? ("alph"->"alpa" subst) = 1
      "omega",   // unrelated
      "omeg",    // delete a            -> ED 1 vs omega
      "zzzzz")   // isolated
      .toDF("c_name")
    val got = graft.pipeline.Dedup.editJoin(names, "c_name")
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    // Driver truth: full quadratic Levenshtein.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val all = names.as[String].collect()
    val want = (for {
      a <- all; b <- all if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.contains(("alXpha", "alpha")) && want.contains(("allha", "alpha"))
      && want.contains(("alph", "alpha")) &&
      !want.exists(p => p._1 == "zzzzz" || p._2 == "zzzzz"))
  }

  test("char KL: self-distribution diverges by zero, disjoint groups by a lot") {
    val docs = Seq(
      ("u1", "aabb ccdd"), ("u2", "aabb ccdd"), // identical distributions
      ("v", "zzzz zzzz")) // disjoint support
      .toDF("lang", "text")
    val kl = graft.pipeline.TextAnalysis.charKl(docs)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // u1/u2 equal the pooled {a,b,c,d,z} corpus less than v does; v's
    // mass sits entirely on z which is rare in the corpus -> largest KL.
    assert(kl.keySet == Set("u1", "u2", "v"))
    assert(math.abs(kl("u1") - kl("u2")) < 1e-12,
      "identical distributions must get identical divergence")
    assert(kl("v") > kl("u1"))
    kl.values.foreach(v => assert(v >= 0.0, s"KL must be non-negative: $v"))
  }

  test("dsir: closed-form log-likelihood ratios, target-like docs score above disjoint docs") {
    // Target corpus: one doc, one bigram ("a b"): ct[b(ab)] = 1, nt = 1.
    // Raw corpus: "a b" (the target bigram), "x y" (disjoint), "q"
    // (no bigram -> absent). ns = 2, B = 64, add-1 smoothing:
    //   log_w(ab) = ln((1+1)/(1+64)) - ln((1+1)/(2+64)) = ln(66/65)
    //   log_w(xy) = ln((0+1)/(1+64)) - ln((1+1)/(2+64)) = ln(66/130)
    // (valid while b("a b") != b("x y") — a fixed property of sha256.)
    val target = docsOf(Seq("a b"))
    val raw = Seq((10L, "a b"), (11L, "x y"), (12L, "q"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.Dsir.logImportanceWeights(target, raw)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(10L, 11L), "no-bigram docs carry no evidence")
    assert(got(10L)._1 == 1 && got(11L)._1 == 1)
    assert(math.abs(got(10L)._2 - math.log(66.0 / 65.0)) < 1e-5)
    assert(math.abs(got(11L)._2 - math.log(66.0 / 130.0)) < 1e-5)
    assert(got(10L)._2 > got(11L)._2,
      "a target-identical doc must outscore a target-disjoint doc")
  }

  test("vocab growth: first-occurrence attribution, short-doc shingle, exact running sum") {
    // doc 0 "a b c d": trigrams {a b c, b c d} -> 2 new.
    // doc 1 "a b c":   its only trigram already seen -> 0 new.
    // doc 2 "x":       short doc contributes its whole text -> 1 new.
    val docs = docsOf(Seq("a b c d", "a b c", "x"))
    val got = graft.pipeline.TextAnalysis.vocabGrowth(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2L, 2L), (1L, 0L, 2L), (2L, 1L, 3L)),
      s"got: ${got.toSeq}")
  }

  test("dup spans: planted copy yields one maximal span per doc, unique text yields none") {
    // Docs 0 and 1 share the 7-token run "p q r s t u v" (3 consecutive
    // 5-windows -> ONE island spanning tokens 2..8 in doc 0, 0..6 in
    // doc 1). Doc 2 is all-unique: no duplicated window, no span.
    val docs = docsOf(Seq(
      "x1 x2 p q r s t u v x3 x4",
      "p q r s t u v y1 y2",
      "z1 z2 z3 z4 z5 z6 z7 z8"))
    val got = graft.pipeline.Dedup.dupSpans(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3))).sortBy(s => (s._1, s._2))
    assert(got.toSeq == Seq((0L, 2, 8, 3), (1L, 0, 6, 3)),
      s"got: ${got.toSeq}")
  }

  test("dup spans: two separated copies stay two islands, not one merged span") {
    // The shared 5-gram "a b c d e" sits at positions 0 AND 7 of doc 0
    // (separated by unique filler), so the island merge must emit two
    // single-window spans, proving adjacency means stride-1 contiguity.
    val docs = docsOf(Seq(
      "a b c d e f1 f2 a b c d e",
      "a b c d e g1 g2"))
    val got = graft.pipeline.Dedup.dupSpans(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3))).sortBy(s => (s._1, s._2))
    assert(got.toSeq == Seq((0L, 0, 4, 1), (0L, 7, 11, 1), (1L, 0, 4, 1)),
      s"got: ${got.toSeq}")
  }

  test("span scrub: cuts exactly the spanned tokens, passes span-free docs verbatim, empties fully-covered docs") {
    import org.apache.spark.sql.functions.col
    val docs = docsOf(Seq(
      "x1 x2 p q r s t u v x3 x4",   // span 2..8 -> keep x1 x2 x3 x4
      "p q r s t u v",                // fully covered -> ''
      "z1 z2 z3 z4 z5 z6 z7 z8"))     // no span -> verbatim
    val got = graft.pipeline.Dedup.scrubSpans(docs,
        graft.pipeline.Dedup.dupSpans(docs))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (0L, 11, 7, "x1 x2 x3 x4"),
      (1L, 7, 7, ""),
      (2L, 8, 0, "z1 z2 z3 z4 z5 z6 z7 z8")),
      s"got: ${got.toSeq}")
  }

  test("decontamination spans: flags only eval overlaps, never train-train duplication") {
    // Train docs 0,1 both contain the eval 5-gram "e1 e2 e3 e4 e5";
    // train docs 1,2 SHARE "t1 t2 t3 t4 t5" but the eval set doesn't —
    // a train-train dup must NOT become a decontamination span (that's
    // d37's job). Eval-internal text never emits rows.
    val train = docsOf(Seq(
      "x1 e1 e2 e3 e4 e5 x2",
      "e1 e2 e3 e4 e5 t1 t2 t3 t4 t5",
      "t1 t2 t3 t4 t5 y1"))
    val eval_ = Seq((100L, "z e1 e2 e3 e4 e5 z2")).toDF("doc_id", "text")
    val got = graft.pipeline.Contamination.contaminatedSpans(train, eval_)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3))).sortBy(s => (s._1, s._2))
    assert(got.toSeq == Seq((0L, 1, 5, 1), (1L, 0, 4, 1)),
      s"got: ${got.toSeq}")
  }

  test("chunk scrub: removes corpus-duplicated chunks, keeps order, survives all-boilerplate docs") {
    // chunkWords=2: doc 0 = [a b][c d][e f], doc 1 = [c d][x y],
    // doc 2 = [a b] — chunks "a b" and "c d" occur >=2 times corpus-wide.
    val docs = docsOf(Seq("a b c d e f", "c d x y", "a b"))
    val got = graft.pipeline.Dedup.chunkScrub(docs, chunkWords = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 3, 2, "e f"), (1L, 2, 1, "x y"), (2L, 1, 1, "")),
      s"got: ${got.toSeq}")
  }

  test("chunk scrub: self-repetition counts as occurrences (the C4 convention)") {
    // Doc 0 repeats its own chunk "a b" — occurrence count 2 with only
    // one distinct doc, so the scrub fires where d10's distinct-doc
    // spread would not.
    val docs = docsOf(Seq("a b a b c d", "x y"))
    val got = graft.pipeline.Dedup.chunkScrub(docs, chunkWords = 2)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((0L, 2, "c d"), (1L, 0, "x y")),
      s"got: ${got.toSeq}")
  }

  test("leakage-free split: no near-dup pair ever crosses sides, both sides populated") {
    val sf = "/root/testdata/sf0.001"
    val split = graft.queries.PipelineQueries
      .d44LeakageFreeSplit(SparkTestSession.spark, sf)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = graft.pipeline.Dedup.ngramJaccard(
        Tables.documents(SparkTestSession.spark, sf),
        blockCol = "source", threshold = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) crosses the split")
    }
    assert(split.values.toSet == Set("train", "holdout"),
      "both sides must be populated")
  }

  test("perplexity buckets: tertiles partition the corpus, rank follows the LM, keep drops the tail") {
    // 6 docs. Under the backoff-free bigram LM a unique bigram with a
    // unique left context has p = 1 (logp 0) — docs 3-5 are maximally
    // "fluent" by this LM and rank top; doc 2 mixes contexts ("a" goes
    // to both "a" and "b") and ranks below doc 0's pure repetition.
    // Exact LM values aren't hand-pinned (the DuckDB gate does that);
    // this pins the bucketing CONTRACT.
    val docs = docsOf(Seq(
      "a a a a", "a a a", "a a b", "c d e", "f g h", "i j k"))
    val r = graft.pipeline.TextAnalysis.perplexityBuckets(docs)
      .collect().map(x => (x.getLong(0), x.getDouble(2), x.getLong(3),
        x.getString(4), x.getBoolean(5)))
    assert(r.length == 6)
    assert(r.count(_._4 == "head") == 2 && r.count(_._4 == "middle") == 2
      && r.count(_._4 == "tail") == 2)
    r.foreach { case (_, _, _, b, k) => assert(k == (b != "tail")) }
    // ranks are exactly the (avg_logp desc, doc_id) order.
    val expected = r.sortBy(x => (-x._2, x._1)).map(_._1).toSeq
    assert(r.sortBy(_._3).map(_._1).toSeq == expected)
    // mixed-context doc 2 ranks strictly below pure-repetition doc 0.
    assert(r.find(_._1 == 2L).get._3 > r.find(_._1 == 0L).get._3)
  }

  test("gopher rules: each rule fires independently on a crafted offender") {
    // 50 words, mean wlen (3+4)/2 = 3.5, stop kinds {the, with} = 2.
    val fiftyGood = Seq.fill(25)("the with").mkString(" ")
    val docs = docsOf(Seq(
      fiftyGood,                                    // keep
      "the of and",                                 // too few words
      Seq.fill(50)("abcdefghijklmnopqrstu the").mkString(" "), // mean wlen (21+3)/2 = 12 > 10
      Seq.fill(25)("# the of #").mkString(" "),     // symbol ratio > 0.1
      Seq.fill(25)("12 34 the of").mkString(" "),   // alpha frac 0.5 < 0.8
      Seq.fill(50)("zz qq").mkString(" ")))         // no stop words
    val got = graft.pipeline.TextAnalysis.gopherRules(docs)
      .collect().map(r => r.getLong(0) -> (
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    assert(got(0L) == ((true, true, true, true, true, true)), s"got: $got")
    assert(!got(1L)._1 && !got(1L)._6)   // word count
    assert(!got(2L)._2 && !got(2L)._6)   // mean word length
    assert(!got(3L)._3 && !got(3L)._6)   // symbol ratio
    assert(!got(4L)._4 && !got(4L)._6)   // alpha fraction
    assert(!got(5L)._5 && !got(5L)._6)   // stop-word kinds
  }

  test("gopher rules: zero shuffles — the whole battery is scan-stage") {
    val plan = graft.pipeline.TextAnalysis.gopherRules(
      docsOf(Seq("the of a b"))).queryExecution.executedPlan
    assert(collectLeaves(plan).count(_.isInstanceOf[ShuffleExchangeExec]) == 0,
      plan.toString)
  }

  test("eval dirtiness: token coverage, buckets, short docs, eval-internal dups") {
    // Train leaks eval 100's "a1..a5" window and ALL of eval 101; eval
    // 102 is under the window size (clean by construction); eval 103
    // has no leak; eval 104/105 share "e1..e5" with EACH OTHER but not
    // with the train side — eval-internal duplication must not flag.
    val train = docsOf(Seq(
      "x b1 b2 b3 b4 b5 b6 y",
      "a1 a2 a3 a4 a5 z"))
    val eval_ = Seq(
      (100L, "a1 a2 a3 a4 a5 q1 q2"),
      (101L, "b1 b2 b3 b4 b5 b6"),
      (102L, "c1 c2 c3"),
      (103L, "d1 d2 d3 d4 d5"),
      (104L, "e1 e2 e3 e4 e5 w1"),
      (105L, "e1 e2 e3 e4 e5 w2")).toDF("doc_id", "text")
    val got = graft.pipeline.Contamination.evalDirtiness(train, eval_)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getString(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (100L, 7, 5, 0.714286, "partial"),
      (101L, 6, 6, 1.0, "dirty"),
      (102L, 3, 0, 0.0, "clean"),
      (103L, 5, 0, 0.0, "clean"),
      (104L, 6, 0, 0.0, "clean"),
      (105L, 6, 0, 0.0, "clean")), s"got: ${got.toSeq}")
  }

  test("eval dirtiness: overlapping hit windows count each token once") {
    // Train contains eval 200's whole 7-token text, so eval windows at
    // pos 0,1,2 all hit; merged span 0..6 covers 7 tokens, not 3×5.
    val train = docsOf(Seq("p1 p2 p3 p4 p5 p6 p7 tail"))
    val eval_ = Seq((200L, "p1 p2 p3 p4 p5 p6 p7")).toDF("doc_id", "text")
    val got = graft.pipeline.Contamination.evalDirtiness(train, eval_)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getString(4)))
    assert(got.toSeq == Seq((200L, 7, 7, 1.0, "dirty")),
      s"got: ${got.toSeq}")
  }

  test("eval dirtiness: NON-adjacent overlapping hits never exceed the doc length") {
    // The r12 advisor case: the training corpus holds two overlapping
    // FRAGMENTS of the eval sample — "p1..p5" and "p3..p7" — but never
    // the bridging window "p2..p6". Eval windows at pos 0 and pos 2 hit,
    // pos 1 does not; the stride-1 island merge made two spans [0,4] and
    // [2,6] summing to 10 contaminated tokens out of 7 (dirty_frac 1.43).
    // The coverage merge collapses them into one span [0,6]: 7 of 7.
    val train = docsOf(Seq("p1 p2 p3 p4 p5 left", "right p3 p4 p5 p6 p7"))
    val eval_ = Seq((300L, "p1 p2 p3 p4 p5 p6 p7")).toDF("doc_id", "text")
    val got = graft.pipeline.Contamination.evalDirtiness(train, eval_)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3), r.getString(4)))
    assert(got.toSeq == Seq((300L, 7, 7, 1.0, "dirty")),
      s"got: ${got.toSeq}")
  }

  test("gopher repetition: non-adjacent overlapping dup-5 windows count coverage once") {
    // One doc, 21 tokens: "a b c d e" repeats at starts {0, 8} and
    // "c d e f g" at starts {2, 15}, but the bridging window at start 1
    // ("b c d e f") occurs once — dup starts {0, 2, 8, 15} with 0 and 2
    // overlapping NON-adjacently. Coverage islands: [0,6] ∪ [8,12] ∪
    // [15,19] = 17 covered tokens; the stride-1 merge read four 5-token
    // spans = 20, double-counting the shared tokens [2,4].
    val docs = Seq((0L,
      "a b c d e f g u a b c d e u v c d e f g v"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.TextAnalysis.gopherRepetitionRules(docs)
      .select("doc_id", "n_tokens", "dup5_cover_frac").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.length == 1)
    assert(got(0)._2 == 21, s"got: ${got.toSeq}")
    assert(math.abs(got(0)._3 - 17.0 / 21.0) < 1e-4,
      s"got: ${got.toSeq}")
  }

  test("quality classifier: separates the classes and scores every input") {
    import graft.pipeline.QualityClassifier
    // 1024 buckets so the toy vocabulary lands collision-free; the
    // sha256-prefix hash is fixed, so this is deterministic forever.
    val pos = docsOf(Seq(
      "good clean prose with structure",
      "clean good argument with evidence"))
    val neg = Seq(
      (10L, "spam junk click now"),
      (11L, "junk spam buy buy")).toDF("doc_id", "text")
    val toScore = Seq(
      (20L, "good clean evidence"),
      (21L, "spam junk buy"),
      (22L, "good spam")).toDF("doc_id", "text")
    val got = QualityClassifier.score(pos, neg, toScore, buckets = 1024)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1)
    assert(got.length == 3)
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(20L)._4 && byId(20L)._3 > 0, s"got: ${got.toSeq}")
    assert(!byId(21L)._4 && byId(21L)._3 < 0, s"got: ${got.toSeq}")
    // Mixed doc: one positive and one negative token of equal evidence
    // (each word appears twice in its class corpus of 9-10 tokens), so
    // the score sits near zero, strictly between the pure docs.
    assert(byId(20L)._3 > byId(22L)._3 && byId(22L)._3 > byId(21L)._3,
      s"got: ${got.toSeq}")
    assert(byId(20L)._2 == 3 && byId(21L)._2 == 3 && byId(22L)._2 == 2)
  }

  test("quality classifier: a doc of entirely-unseen buckets still appears") {
    import graft.pipeline.QualityClassifier
    val pos = docsOf(Seq("good clean prose"))
    val neg = Seq((10L, "spam junk garbage")).toDF("doc_id", "text")
    // Drifted corpus: no token shared with either training side. With
    // 1<<20 buckets the 3+3 training tokens occupy ≤6 buckets, so the
    // probe tokens land unseen (deterministic sha256 hash — fixed
    // forever); the r12 advisor case was this doc silently vanishing
    // from the inner-joined output.
    val toScore = Seq((30L, "zzqx1 zzqx2")).toDF("doc_id", "text")
    val got = QualityClassifier.score(pos, neg, toScore, buckets = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(got.toSeq.map(_._1) == Seq(30L), s"got: ${got.toSeq}")
    assert(got(0)._2 == 2, s"got: ${got.toSeq}")
    // Equal class doc counts -> prior = ln(1) = 0; unseen tokens carry
    // zero log-odds -> the score is exactly the bare prior.
    assert(got(0)._3 == 0.0, s"got: ${got.toSeq}")
  }

  test("gopher repetition rules: each rule fires on its own pathology") {
    val docs = docsOf(Seq(
      // 0: ten distinct words — every fraction small, all rules pass.
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
      // 1: one bigram ("x y") is 5 of 9 bigrams — top2 rule fails;
      //    the repeated "x y x y x" 5-grams also blow dup5 coverage.
      "x y x y x y x y x y",
      // 2: a repeated 5-gram but diverse n-grams elsewhere: only dup5
      //    coverage is threatened.
      "a1 a2 a3 a4 a5 m1 m2 m3 m4 m5 m6 m7 m8 a1 a2 a3 a4 a5"))
    val got = graft.pipeline.TextAnalysis
      .gopherRepetitionRules(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(6), r.getBoolean(9), r.getBoolean(10)))).toMap
    // (ok_top2, ok_dup5, keep)
    assert(got(0L) == ((true, true, true)), got)
    assert(got(1L) == ((false, false, false)), got)
    assert(got(2L)._1 && !got(2L)._2 && !got(2L)._3, got)
  }

  test("quality calibration: decile partition is exact and consistent with the corpus") {
    val rows = graft.queries.PipelineQueries
      .t25QualityCalibration(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (0 to 9), "bins must be exactly 0..9")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val n = docs.count()
    val nPos = docs.filter(col("source") === "src0").count()
    assert(rows.map(_._2.toLong).sum == n, "bins must partition the corpus")
    // Rank-based deciles differ by at most one doc in size.
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1)
    // The bin-weighted observed rate reconstructs the corpus prior.
    val w = rows.map(t => t._2 * t._4).sum / n
    assert(math.abs(w - nPos.toDouble / n) < 1e-4, s"got $w")
    // Probabilities live in (0, 1) and are non-decreasing along the
    // score-ranked bins (sigmoid is monotone in the ranked score).
    assert(rows.forall(t => t._3 > 0.0 && t._3 < 1.0))
    assert(rows.map(_._3).sliding(2).forall {
      case Array(a, b) => a <= b
      case _ => true
    })
  }

  test("quality classifier: the prior shifts the decision boundary") {
    import graft.pipeline.QualityClassifier
    // Same token stats, but positives are 4 docs vs 1 negative doc —
    // ln(4/1) lifts every score by ~1.386 vs the balanced run.
    val posBal = docsOf(Seq("alpha beta"))
    val negBal = Seq((10L, "gamma delta")).toDF("doc_id", "text")
    val toScore = Seq((20L, "alpha gamma")).toDF("doc_id", "text")
    val balanced = QualityClassifier
      .score(posBal, negBal, toScore, buckets = 1024)
      .collect().head.getDouble(2)
    val posSkew = docsOf(Seq("alpha beta", "alpha beta", "alpha beta",
      "alpha beta"))
    val skewed = QualityClassifier
      .score(posSkew, negBal, toScore, buckets = 1024)
      .collect().head.getDouble(2)
    // Token evidence also moves (4× the positive mass), but the shift
    // must at least include the prior's direction.
    assert(skewed > balanced, s"skewed=$skewed balanced=$balanced")
  }
}
