package graft

import graft.pipeline.Search
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the retrieval operators: heavy-hitter n-grams against a
  * brute-force recount, BM25 against a direct reimplementation of the
  * formula plus the structural properties (term-absent docs excluded,
  * more matching occurrences → higher score, rarer term → higher idf
  * contribution).
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topNgrams matches brute-force trigram counting, deterministic order") {
    val texts = Seq(
      "a b c a b c a b", "a b c d e", "x y", "a b c",
      "d e a b c d e")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Search.topNgrams(df, n = 3, k = 5)
      .as[(String, Long)].collect().toSeq
    val want = texts.flatMap { t =>
      val w = t.toLowerCase.split("\\s+").toSeq
      if (w.length >= 3) w.sliding(3).map(_.mkString(" ")).toSeq else Seq.empty
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (g, n) => (-n, g) }.take(5)
    assert(got == want)
  }

  test("bm25 matches a direct reimplementation of the formula") {
    val docs = Seq(
      (1L, "hash join hash scan"),
      (2L, "vector scan table"),
      (3L, "sort merge window"), // no query term -> absent from output
      (4L, "hash hash hash hash hash"))
      .toDF("doc_id", "text")
    val terms = Seq("hash", "join", "vector")
    val got = Search.bm25(docs, terms).as[(Long, Double)].collect().toMap

    val toks = Map(1L -> "hash join hash scan", 2L -> "vector scan table",
      3L -> "sort merge window", 4L -> "hash hash hash hash hash")
      .view.mapValues(_.split("\\s+").toSeq).toMap
    val n = toks.size.toDouble
    val avgdl = toks.values.map(_.length).sum / n
    val (k1, b) = (1.2, 0.75)
    def score(id: Long): Double = {
      val dl = toks(id).length.toDouble
      val raw = terms.map { t =>
        val tf = toks(id).count(_ == t).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.values.count(_.contains(t)).toDouble
          math.log((n - df + 0.5) / (df + 0.5) + 1) * tf * (k1 + 1) /
            (tf + k1 * (1 - b + b * dl / avgdl))
        }
      }.sum
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet == Set(1L, 2L, 4L), "term-absent doc must be excluded")
    Seq(1L, 2L, 4L).foreach { id =>
      assert(math.abs(got(id) - score(id)) < 1e-9,
        s"doc $id: got ${got(id)}, want ${score(id)}")
    }
    // Structural: BM25 saturates term frequency — a single term's
    // contribution is bounded by idf·(k1+1) no matter how often it
    // repeats, so doc 4 (five 'hash' repeats, nothing else) stays under
    // that asymptote and below doc 1's two-term match.
    val idfHash = math.log((n - 2 + 0.5) / (2 + 0.5) + 1)
    assert(got(4L) < idfHash * (k1 + 1))
    assert(got(1L) > got(4L))
  }

  test("tfidf: planted corpus scores and ranks; WindowGroupLimit plan") {
    // 4 docs; "rare" appears only in doc 1 (idf = ln 4), "common" in all
    // four (idf = 0 -> never a top term when an alternative exists).
    val docs = Seq(
      (1L, "rare common common alpha"),
      (2L, "alpha alpha common beta"),
      (3L, "beta common beta beta"),
      (4L, "common gamma gamma gamma")).toDF("doc_id", "text")
    val got = Search.tfidfTopK(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getDouble(4)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == Set(1L, 2L, 3L, 4L))
    byDoc.values.foreach { g =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to sorted.length),
        "ranks contiguous from 1")
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a._5 >= b._5 },
        "scores non-increasing in rank")
    }
    // doc 1's top term must be the exclusive word at tf=1·ln(4).
    val d1 = byDoc(1L).minBy(_._2)
    assert(d1._3 == "rare" &&
      math.abs(d1._5 - BigDecimal(math.log(4.0)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // "common" scores 0 everywhere (df = N) and must lose to any
    // positive-idf term; doc 3's winner is "beta" (tf 3, df 2).
    val d3 = byDoc(3L).minBy(_._2)
    assert(d3._3 == "beta" && d3._4 == 3L)
    val plan = Search.tfidfTopK(docs, k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k must rewrite to WindowGroupLimit:\n${plan.take(600)}")
  }

  test("rrfFuse: hand-checked fusion, one-leg docs contribute a single term") {
    val lex = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("doc_id", "rank")
    val vec = Seq((11L, 1), (13L, 2)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(Seq("lex" -> lex, "vec" -> vec), topK = 10)
      .as[(Long, Option[Int], Option[Int], Double)].collect().toSeq
    // 11: 1/62 + 1/61; 10: 1/61; 13: 1/62; 12: 1/63 — fused order.
    assert(got.map(_._1) == Seq(11L, 10L, 13L, 12L))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(11L)._2.contains(2) && byId(11L)._3.contains(1))
    assert(byId(10L)._3.isEmpty && byId(13L)._2.isEmpty)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(11L)._4 == r6(1.0 / 62 + 1.0 / 61))
    assert(byId(10L)._4 == r6(1.0 / 61))
    assert(byId(12L)._4 == r6(1.0 / 63))
    // topK truncates on the fused order, ties broken by id.
    val top2 = Search.rrfFuse(Seq("lex" -> lex, "vec" -> vec), topK = 2)
      .as[(Long, Option[Int], Option[Int], Double)].collect().map(_._1).toSeq
    assert(top2 == Seq(11L, 10L))
  }

  test("kwicSnippets: first occurrence, edge clamping, absent docs dropped") {
    val docs = Seq(
      (1L, "vector a b c d"),          // term at start: clamp left
      (2L, "a b c vector d e f"),      // interior: full ±3 window
      (3L, "a b c d e vector"),        // term at end: clamp right
      (4L, "x y z"),                   // absent: excluded
      (5L, "a vector b vector c"))     // repeated: FIRST occurrence only
      .toDF("doc_id", "text")
    val got = Search.kwicSnippets(docs, "vector", window = 3)
      .as[(Long, Long, String)].collect()
      .map { case (id, p, s) => id -> (p, s) }.toMap
    assert(got.keySet == Set(1L, 2L, 3L, 5L))
    assert(got(1L) == (1L, "vector a b c"))
    assert(got(2L) == (4L, "a b c vector d e f"))
    assert(got(3L) == (6L, "c d e vector"))
    assert(got(5L) == (2L, "a vector b vector c"))
  }

  test("rrfFuse rejects a leg with duplicate ids loudly (ADVICE r13)") {
    val lex = Seq((10L, 1), (11L, 2)).toDF("doc_id", "rank")
    val dup = Seq((11L, 1), (11L, 2), (13L, 3)).toDF("doc_id", "rank")
    val e = intercept[IllegalArgumentException] {
      Search.rrfFuse(Seq("lex" -> lex, "vec" -> dup), topK = 5)
    }
    assert(e.getMessage.contains("duplicate doc_id"))
  }

  test("kwicSnippets matches a mixed-case term against lowercased tokens") {
    val docs = Seq((1L, "The Vector sum"), (2L, "no match here"))
      .toDF("doc_id", "text")
    val got = Search.kwicSnippets(docs, "Vector", window = 1)
      .as[(Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 2L, "the vector sum")))
  }

  test("pmiCollocations: hand-checked PMI, support floor, whole-mass denominator") {
    // Corpus tokens: "a b" x3 (always adjacent), plus "a", "b", and "c d"
    // fillers. Bigrams: (a b) x3, (b a) x2, (b c), (c d) x2, (d a), (a c),
    // (c b) ... build a corpus small enough to count by hand:
    // doc1: a b a b  -> bigrams: ab, ba, ab
    // doc2: a b c d  -> ab, bc, cd
    // doc3: c d      -> cd
    val docs = Seq((1L, "a b a b"), (2L, "a b c d"), (3L, "c d"))
      .toDF("doc_id", "text")
    // unigrams: a=3 b=3 c=2 d=2 (N_uni=10); bigrams: ab=3 ba=1 bc=1 cd=2
    // — total bigram mass N_bi=7.
    val got = graft.pipeline.Search
      .pmiCollocations(docs, k = 10, minCount = 2)
      .as[(String, Long, Double, Int)].collect().toSeq
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // survivors at minCount=2: "a b" (3) and "c d" (2); PMI over the
    // WHOLE mass 7: ab = ln((3/7)/((3/10)*(3/10))), cd = ln((2/7)/((2/10)*(2/10)))
    val pmiAb = r4(math.log((3.0 / 7) / ((3.0 / 10) * (3.0 / 10))))
    val pmiCd = r4(math.log((2.0 / 7) / ((2.0 / 10) * (2.0 / 10))))
    assert(got.map(_._1).toSet == Set("a b", "c d"))
    val m = got.map(g => g._1 -> g).toMap
    assert(m("a b")._2 == 3L && m("a b")._3 == pmiAb)
    assert(m("c d")._2 == 2L && m("c d")._3 == pmiCd)
    // cd has higher PMI (rarer parts): rank 1
    assert(pmiCd > pmiAb && m("c d")._4 == 1 && m("a b")._4 == 2)
  }

  test("expandQuery: hand-checked pseudo-relevance expansion") {
    // seed "q": docs 1 (tf 2) and 2 (tf 1) are the pseudo-relevant set
    // (relK 2); doc 3 never enters. Candidate terms: "alpha" (tf_rel 3,
    // df 2), "beta" (tf_rel 1, df 3 -> idf smallest), "rare" (tf_rel 1,
    // df 1 -> idf ln(3)).
    val docs = Seq(
      (1L, "q q alpha alpha rare"),
      (2L, "q alpha beta"),
      (3L, "beta beta alpha common"))
      .toDF("doc_id", "text")
    val got = Search.expandQuery(docs, "q", relK = 2, topM = 3)
      .as[(String, Double, Int)].collect().toSeq
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // scores: alpha 3*ln(3/3)=0, rare 1*ln(3/1)=1.0986, beta 1*ln(3/2)
    assert(got.map(_._1) == Seq("rare", "beta", "alpha"))
    assert(got(0)._2 == r4(math.log(3.0)))
    assert(got(1)._2 == r4(math.log(1.5)))
    assert(got(2)._2 == 0.0)
    assert(got.map(_._3) == Seq(1, 2, 3))
  }

  test("phraseHits: adjacency only, first hit, case-insensitive, edge-safe") {
    val docs = Seq(
      (1L, "Data Window opens"),        // hit at 1 (case folded)
      (2L, "the data window data window"), // first hit at 2
      (3L, "data x window"),            // non-adjacent: no hit
      (4L, "window data"),              // wrong order: no hit
      (5L, "data"))                     // single token: filtered pre-HOF
      .toDF("doc_id", "text")
    val got = Search.phraseHits(docs, "data", "window")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
  }

  test("rankEval: hand-checked nDCG/MRR/precision") {
    // ranks 1..4, relevant at 2 and 4; corpus has 3 relevant total.
    val ranked = Seq((1, 0), (2, 1), (3, 0), (4, 1)).toDF("rank", "rel")
    val got = Search.rankEval(ranked, k = 4, totalRelevant = 3L)
      .as[(Int, Double, Double, Double)].head()
    def log2(x: Double) = math.log(x) / math.log(2)
    val dcg = 1 / log2(3) + 1 / log2(5)
    val idcg = 1 / log2(2) + 1 / log2(3) + 1 / log2(4) // min(k=4, R=3) terms
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 4)
    assert(got._2 == r4(dcg / idcg))
    assert(got._3 == 0.5)     // first relevant at rank 2
    assert(got._4 == 0.5)     // 2 of 4
  }

  test("rankTopN: round-then-rank contract, id ties, n-bounded output") {
    val scored = Seq((4L, 1.0), (2L, 3.0), (3L, 3.0), (1L, 2.0))
      .toDF("doc_id", "s")
    val got = Search.rankTopN(scored, "s", n = 3)
      .as[(Long, Double, Int)].collect().toSeq.sortBy(_._3)
    // ties at 3.0 break by doc_id: 2 -> rank 1, 3 -> rank 2, then 1.
    assert(got.map(g => (g._1, g._3)) == Seq((2L, 1), (3L, 2), (1L, 3)))
  }

  test("textRankKeywords: hub term outranks frequent-but-peripheral terms") {
    // "hub" is adjacent to 4 distinct partners (each pair 3x, clearing
    // the floor); "noise" repeats a lot but only ever touches "pad".
    val docs = (
      (1 to 3).map(i => (i.toLong, "hub alpha hub beta hub gamma hub delta"))
        ++ Seq((4L, "noise pad noise pad noise pad noise pad noise pad " +
          "noise pad noise pad"))
      ).toDF("doc_id", "text")
    val got = Search.textRankKeywords(docs, k = 10, minCount = 3,
      iterations = 10).as[(String, Double, Int)].collect().sortBy(_._3)
    assert(got.head._1 == "hub", s"expected hub first, got ${got.toSeq}")
    // The degree-4 hub must outrank every degree-1 spoke and both
    // members of the isolated noise-pad pair.
    val scores = got.map(g => g._1 -> g._2).toMap
    assert(Seq("alpha", "beta", "gamma", "delta", "noise", "pad")
      .forall(t => scores("hub") > scores(t)))
  }

  test("textRankKeywords: support floor prunes rare adjacencies") {
    // "rare cameo" appears twice — below minCount=3 — so neither token
    // may enter the graph; the a-b pair appears 3x and survives.
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "rare cameo"),
      (3L, "rare cameo")).toDF("doc_id", "text")
    val got = Search.textRankKeywords(docs, k = 10, minCount = 3,
      iterations = 5).as[(String, Double, Int)].collect().map(_._1).toSet
    assert(got == Set("a", "b"))
  }
}
