package graft

import graft.pipeline.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Vector aggregate operators (v1/v2) — the DuckDB gates pin full
  * results; these pin closed-form geometry and the scale-critical plan
  * shape.
  */
class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("centroid cohesion: closed form on a hand-computable cluster") {
    // Label 0: (1,0) and (0,1) -> centroid (.5,.5); each cos = 1/sqrt(2).
    // Label 1: identical vectors -> centroid = the vector, cos = 1.
    val vecs = Seq(
      (0, 1L, Seq(1f, 0f)), (0, 2L, Seq(0f, 1f)),
      (1, 3L, Seq(3f, 4f)), (1, 4L, Seq(3f, 4f)))
      .toDF("label", "vec_id", "embedding")
    val got = Similarity.labelCentroidCohesion(vecs)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got(0)._1 == 2L && got(1)._1 == 2L)
    assert(math.abs(got(0)._2 - math.sqrt(0.5)) < 1e-6)
    assert(math.abs(got(1)._2 - 1.0) < 1e-6)
  }

  test("knn join: every vector gets min(k, block-1) neighbors, ranked and symmetric-sane") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sizes = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = Similarity.knnJoinByLabel(emb, k = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    val byQ = rows.groupBy(_._2)
    byQ.foreach { case (_, g) =>
      val lbl = g.head._1
      assert(g.length == math.min(3L, sizes(lbl) - 1),
        "each query must get min(k, block size - 1) neighbors")
      // Ranks are 1..m and sims descend along them.
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1 to g.length))
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 >= y._4
        case _ => true
      })
      // No self-pairs, neighbors share the label.
      g.foreach { case (l, q, n, _, _) =>
        assert(q != n && l == lbl)
      }
    }
    assert(byQ.size == emb.count())
  }

  test("knn join plan keeps the group-limit before the window exchange") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = Similarity.knnJoinByLabel(emb, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank filter must rewrite to WindowGroupLimit:\n$plan")
  }

  test("sq8: closed-form codes, half-step error bound, constant dim") {
    // dim 1 spans [0,1]: x=0 -> code 0, x=1 -> code 255, x=0.5 -> 128
    //   (floor(127.5+0.5)); recon(128) = 128/255, |err| = 0.5/255·(1/... )
    // dim 2 is CONSTANT: dmax == dmin -> code 0, recon = dmin, err 0.
    val vecs = Seq(
      (1L, Seq(0f, 7f)), (2L, Seq(1f, 7f)), (3L, Seq(0.5f, 7f)))
      .toDF("vec_id", "embedding")
    val rows = Similarity.sq8Quantization(vecs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.length == 2)
    val d1 = rows.find(_._1 == 1L).get
    assert(d1._2 == 0.0 && d1._3 == 1.0)
    // worst reconstruction: x=0.5f -> code 128, recon 128/255 ≈ 0.50196
    val xMid = 0.5f.toDouble
    val expectedErr = math.abs(xMid - 128.0 / 255.0)
    assert(math.abs(d1._4 - expectedErr) < 1e-12)
    assert(d1._5 == 1.0 / 510.0 && d1._6, "bound = half step; ok holds")
    val d2 = rows.find(_._1 == 2L).get
    assert(d2._4 == 0.0 && d2._6,
      "constant dimension must quantize exactly with ok=true")
    // Endpoints must reconstruct exactly (codes 0 and 255).
    assert(d1._4 < d1._5 * 1.0000001)
  }

  test("pq: ADC equals distance-to-reconstruction; codes bounded; deterministic") {
    // 16-dim corpus, m=4 subspaces of 4 dims, 4 codes each. Random but
    // seeded; enough points that every centroid attracts members.
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 60L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val cbs = Similarity.pqCodebooks(vecs, m = 4, codebookSize = 4, dim = 16)
    assert(cbs.length == 4 && cbs.forall(_.length == 4) &&
      cbs.forall(_.forall(_.length == 4)))
    val codes = Similarity.pqEncode(vecs, cbs)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes.size == 60 * 4, "one code per (vector, subspace)")
    assert(codes.values.forall(c => c >= 0 && c < 4))
    // The ADC identity: sum over subspaces of the q->centroid table
    // lookups IS the exact squared distance from q to the vector's
    // reconstruction. Recompute both driver-side from the same codes.
    val raw = vecs.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val qId = 0L
    val adc = Similarity.pqAdcScores(vecs, qId, 4, 4, 16, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val q = raw(qId)
    raw.keys.filter(_ != qId).foreach { id =>
      val recon = (0 until 4).flatMap(s => cbs(s)(codes((id, s)))).toArray
      val d2 = q.indices.map(i => (q(i) - recon(i)) * (q(i) - recon(i))).sum
      assert(math.abs(adc(id) - d2) < 1e-9 * (1 + d2),
        s"ADC must equal ||q - recon||^2 for vec $id")
    }
    // Encoding is the argmin: no other code gives a smaller distance to
    // the vector's own subvector (ties broken toward the smaller code).
    raw.keys.foreach { id =>
      (0 until 4).foreach { s =>
        val sub = raw(id).slice(s * 4, s * 4 + 4)
        def d2(c: Array[Double]) =
          sub.indices.map(i => (sub(i) - c(i)) * (sub(i) - c(i))).sum
        val chosen = d2(cbs(s)(codes((id, s))))
        cbs(s).zipWithIndex.foreach { case (c, k) =>
          assert(d2(c) > chosen - 1e-12 ||
            (math.abs(d2(c) - chosen) < 1e-12 && k >= codes((id, s))))
        }
      }
    }
    // Determinism: a second run (fresh plan, same seed) returns the same
    // top-k; and the rerank output is a subset of the exact metric's
    // ordering semantics (dist ascending).
    val t1 = Similarity.pqTopK(vecs, qId, 5, m = 4, codebookSize = 4,
      dim = 16, shortlist = 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val t2 = Similarity.pqTopK(vecs, qId, 5, m = 4, codebookSize = 4,
      dim = 16, shortlist = 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(t1.toSeq == t2.toSeq)
    assert(t1.map(_._2).toSeq == t1.map(_._2).sorted.toSeq)
  }

  test("semdedup: multi-probe assignment contract (p rows, distinct clusters, argmin first)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val assigned = Similarity.semanticClusters(emb, nClusters = 8, probes = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    assert(assigned.length == n * 3, "exactly `probes` rows per vector")
    assigned.groupBy(_._1).foreach { case (id, g) =>
      assert(g.map(_._2).distinct.length == 3,
        s"vector $id probed a repeated cluster")
    }
    // probes = nClusters degenerates to every cluster per vector.
    val all = Similarity.semanticClusters(emb, nClusters = 4, probes = 4)
      .groupBy(col("vec_id")).agg(countDistinct(col("sem_cluster")).as("nc"))
      .collect()
    assert(all.forall(_.getLong(1) == 4))
  }

  test("semdedup: pair set equals the exhaustive global pair set at sf0.001 (measured recall 1.0 at the defaults)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.cosinePairsExact(
        emb.select(lit(0).as("blk"), col("vec_id"), col("embedding")),
        "blk", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Similarity.semanticDedupPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Precision 1.0 by construction (the verify is exact); recall 1.0 is
    // a measured property of (k=8, p=3) on this corpus — a clustering or
    // probe regression breaks set equality here before the gate floor
    // (0.85) would catch it at the driver's decade.
    assert(got == exact, s"got ${got.size} pairs vs exact ${exact.size}")
  }

  test("prototypicality: closed form, round-before-rank, topP filter") {
    // Label 0: (1,0), (0,1), (1,1) -> centroid (2/3, 1/3 + 1/3)... compute:
    // centroid c = ((1+0+1)/3, (0+1+1)/3) = (2/3, 2/3). cos((1,1), c) = 1
    // (parallel) -> rank 1; (1,0) and (0,1) tie at 1/sqrt(2) -> id order.
    val vecs = Seq(
      (0, 10L, Seq(1f, 0f)), (0, 11L, Seq(0f, 1f)), (0, 12L, Seq(1f, 1f)),
      (1, 20L, Seq(2f, 0f)), (1, 21L, Seq(0f, 5f)))
      .toDF("label", "vec_id", "embedding")
    val got = Similarity.prototypicality(vecs, topP = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    val l0 = got.filter(_._1 == 0).sortBy(_._2)
    assert(l0.map(x => (x._2, x._3)).toSeq == Seq((1, 12L), (2, 10L)),
      s"label 0 must rank (1,1) first, then (1,0) on the id tiebreak: ${l0.toSeq}")
    assert(math.abs(l0.head._4 - 1.0) < 1e-6)
    assert(math.abs(l0(1)._4 - math.sqrt(0.5)) < 1e-4)
    // topP truncates: label 0 has 3 vectors, only 2 emitted.
    assert(got.count(_._1 == 0) == 2)
    // Label 1: centroid (1, 2.5); both cosines < 1, ranks 1..2 emitted.
    assert(got.count(_._1 == 1) == 2)
  }

  test("ivfpq: probing every list degenerates to plain PQ (same shortlist, identical result)") {
    // With nProbe = nClusters the probe filter keeps the whole corpus,
    // so IVF-PQ and corpus-wide PQ must emit the SAME top-k — the
    // composition adds routing, never a different distance. A fixed
    // shortlist removes the only other knob.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val full = Similarity.ivfPqTopK(emb, 0L, 10, nClusters = 16,
        nProbe = 16, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pq = Similarity.pqTopK(emb, 0L, 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == pq, s"ivfpq(all lists)=$full vs pq=$pq")
    // And a narrow probe returns k valid non-query rows with ascending
    // exact distances (the rerank contract).
    val narrow = Similarity.ivfPqTopK(emb, 0L, 10, nProbe = 4,
        shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(narrow.length == 10 && narrow.forall(_._1 != 0L))
    assert(narrow.map(_._2).toSeq == narrow.map(_._2).sorted.toSeq)
  }

  test("pq index persists: artifact bit-identical, reloaded serve matches to sum-order ulps") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    Similarity.pqSaveIndex(emb, dir)
    // The ARTIFACT is exact: reloaded codebook cells and the stored
    // codes table equal the in-memory index bit for bit.
    val cbsMem = Similarity.pqCodebooks(emb, 8, 16, 64)
    val cbsDisk = Similarity.pqLoadCodebooks(spark, dir)
    assert(cbsMem.length == cbsDisk.length)
    cbsMem.indices.foreach { s =>
      cbsMem(s).indices.foreach { k =>
        assert(cbsMem(s)(k).sameElements(cbsDisk(s)(k)),
          s"codebook cell ($s,$k) diverged")
      }
    }
    val codesDisk = spark.read.parquet(s"$dir/codes")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val codesMem = Similarity.pqEncode(emb, cbsMem)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(codesDisk == codesMem, "stored codes diverged from a re-encode")
    // The served score matches to summation-order ulps (the per-id
    // 8-term sum folds in partition order; parquet re-partitions).
    val mem = Similarity.pqAdcScores(emb, 0L, 8, 16, 64, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val disk = Similarity.pqAdcScoresFromIndex(spark, dir, emb, 0L, 8, 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(disk.size == mem.size && disk.keySet == mem.keySet)
    mem.foreach { case (id, s) =>
      assert(math.abs(disk(id) - s) <= math.ulp(s) * 4,
        s"id $id: $s vs ${disk(id)}")
    }
    // Parameter drift vs the stored codebooks must be an ERROR (the
    // same advisory class as the near-dup index params): m=4 would
    // subspace the query differently from the stored codes.
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqAdcScoresFromIndex(spark, dir, emb, 0L, 4, 64)
    }
    assert(ex.getMessage.contains("m=8"), ex.getMessage)
  }

  test("semdedup index persists: reload equals fresh; incremental batch probe hits") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("semidx").toString
    try {
      Similarity.semSaveIndex(emb, dir)
      // Stored assignments are bit-identical to a fresh derivation (the
      // seeded fit + deterministic ranking make the index a pure
      // function of the corpus).
      val fresh = Similarity.semanticClusters(emb, 8, 3)
        .select("vec_id", "sem_cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val stored = spark.read.parquet(s"$dir/assignments")
        .select("vec_id", "sem_cluster")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(stored == fresh, "assignment artifact drifted")
      // Pairs served from the index at rest equal the fresh pair set.
      val freshPairs = Similarity.semanticDedupPairs(emb)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val servedPairs = Similarity.semanticDedupPairsFromIndex(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(servedPairs == freshPairs,
        s"served ${servedPairs.size} vs fresh ${freshPairs.size}")
      // Incremental ingest: a batch that IS two corpus vectors (under
      // probe ids) must rediscover itself through the stored centroids
      // — self-sim 1.0 — without any refit.
      val batch = emb.filter(col("vec_id").isin(0L, 1L))
        .select((col("vec_id") + 90000L).as("vec_id"), col("embedding"))
      val inc = Similarity.incrementalSemanticDedup(spark, dir, batch)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(inc.exists(t => t._1 == 90000L && t._2 == 0L && t._3 == 1.0),
        s"planted copy not found: ${inc.toSeq.take(10)}")
      assert(inc.exists(t => t._1 == 90001L && t._2 == 1L && t._3 == 1.0),
        s"planted copy not found: ${inc.toSeq.take(10)}")
      // Corpus-internal pairs never appear on the batch side.
      assert(inc.forall(_._1 >= 90000L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("k-center coreset: greedy farthest-point chain with deterministic tiebreak") {
    // Seed = lowest id (1 at origin). Then: 4 is farthest (d²=101);
    // next, 5's min-dist 25 beats 2 and 3 (both at 1); finally 2 and 3
    // tie at min-dist 1 — the lower id must win.
    val vecs = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(1f, 0f)), (3L, Seq(10f, 0f)),
      (4L, Seq(10f, 1f)), (5L, Seq(-5f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(vecs, k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, 1L, 0.0), (2, 4L, 101.0), (3, 5L, 25.0), (4, 2L, 1.0)),
      s"got: ${got.toSeq}")
  }

  test("k-center coreset: k=1 is just the seed; k covers all points when k=n") {
    val vecs = Seq((7L, Seq(1f, 2f)), (9L, Seq(3f, 4f)))
      .toDF("vec_id", "embedding")
    val one = Similarity.kCenterCoreset(vecs, k = 1).collect()
    assert(one.length == 1 && one(0).getLong(1) == 7L)
    val all = Similarity.kCenterCoreset(vecs, k = 2)
      .collect().map(_.getLong(1)).toSet
    assert(all == Set(7L, 9L))
    // k beyond the corpus emits every point once, never loops or throws.
    val over = Similarity.kCenterCoreset(vecs, k = 5)
      .collect().map(_.getLong(1)).toSeq
    assert(over.sorted == Seq(7L, 9L))
  }

  test("hard negatives: routes to the most-similar foreign prototype, never the own label") {
    // Label 0 points along x, label 1 along y, label 2 on the diagonal.
    // A label-0 query is far more similar to the label-2 prototype
    // (cos ≈ .71) than label 1's (cos ≈ .05), so its hard negatives
    // must come from label 2 — and symmetrically for label 1.
    val vecs = Seq(
      (0, 1L, Seq(1f, 0f)), (0, 2L, Seq(0.9f, 0.1f)),
      (1, 3L, Seq(0f, 1f)), (1, 4L, Seq(0.1f, 0.9f)),
      (2, 5L, Seq(0.7f, 0.7f)), (2, 6L, Seq(0.6f, 0.8f)))
      .toDF("label", "vec_id", "embedding")
    val rows = Similarity.hardNegatives(vecs, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getDouble(5)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    rows.foreach { case (_, label, negLabel, _, nid, _) =>
      assert(negLabel != label, "a hard negative must be cross-label")
      val nidLabel = Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
        5L -> 2, 6L -> 2)(nid)
      assert(nidLabel == negLabel, "neighbors come from the routed label")
    }
    // Both axis classes route to the diagonal prototype; the diagonal
    // class routes to whichever axis prototype edges it (deterministic
    // either way — just not its own).
    assert(byQ(1L).forall(_._3 == 2) && byQ(3L).forall(_._3 == 2))
    // Ranks are contiguous from 1 and sims descend along them; block
    // size 2 with k=2 means exactly 2 rows per query.
    byQ.values.foreach { g =>
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to g.length))
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._6 >= y._6
        case _ => true
      })
      assert(g.length == 2)
    }
    // Closed form for query 1 = (1,0) against label 2's members: (.7,.7)
    // and (.6,.8) → cos .7071 vs .6, so nid 5 outranks nid 6.
    val q1 = byQ(1L).sortBy(_._4).map(t => (t._5, t._6)).toSeq
    assert(q1 == Seq((5L, 0.7071), (6L, 0.6)), s"got $q1")
  }

  test("mmrRerank: diversification demotes the near-duplicate runner-up") {
    // q = (1,0); a and b nearly identical high-relevance hits, c a
    // distinct mid-relevance one. Pure relevance orders (a, b, c); at
    // λ = 0.3 the (1−λ)·sim(b, a) ≈ 0.7 penalty pushes b below c.
    val df = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.99, 0.10)),  // a: rel .995
      (2L, Seq(0.99, 0.11)),  // b: rel .9939, cos(b,a) ≈ 1.0
      (3L, Seq(0.80, 0.60)))  // c: rel .8,   cos(c,a) ≈ .8563
      .toDF("vec_id", "embedding")
    val got = graft.pipeline.Similarity
      .mmrRerank(df, queryId = 0L, candidates = 3, select = 3, lambda = 0.3)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1, 2, 3), "contiguous selection ranks")
    assert(got.map(_._2) == Seq(1L, 3L, 2L),
      s"diversified order must be (a, c, b); got ${got.map(_._2)}")
    // Independent greedy reimplementation pins the emitted scores.
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      r(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)), 4)
    }
    val vecs = Map(1L -> Seq(0.99, 0.10), 2L -> Seq(0.99, 0.11),
      3L -> Seq(0.80, 0.60))
    val rel = vecs.view.mapValues(v => cos(v, Seq(1.0, 0.0))).toMap
    var sel = Seq.empty[Long]
    val want = (1 to 3).map { k =>
      val (bid, bsc) = (vecs.keySet -- sel).toSeq.map { id =>
        val pen = if (sel.isEmpty) 0.0
          else sel.map(s => cos(vecs(id), vecs(s))).max
        (id, 0.3 * rel(id) - (1 - 0.3) * pen)
      }.minBy { case (id, sc) => (-sc, id) }
      sel = sel :+ bid
      (k, bid, r(bsc, 6))
    }
    assert(got == want, s"got $got want $want")
  }

  test("mmrRerank: select=1 returns the pure-relevance argmax at λ·rel") {
    val df = Seq((0L, Seq(1.0, 0.0)), (7L, Seq(0.9, 0.1)),
      (8L, Seq(0.2, 0.9))).toDF("vec_id", "embedding")
    val got = graft.pipeline.Similarity
      .mmrRerank(df, queryId = 0L, candidates = 2, select = 1, lambda = 0.7)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) == Seq((1, 7L)))
  }

  test("matryoshkaTopK: prefix shortlist can exclude a full-dim winner; " +
      "wide shortlist recovers it") {
    // Query = (1,0 | 0,0). Vector 10 matches ONLY in the suffix dims
    // (prefix cosine 0) — a tight shortlist of 2 keeps 11 and 12 (both
    // prefix-aligned) and never sees 10; the full-dim rerank then
    // cannot recover it. Widening the shortlist to all 3 does.
    val df = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (10L, Seq(0.0, 0.0, 1.0, 0.0)),  // suffix-only: prefix sim 0
      (11L, Seq(1.0, 0.0, 0.0, 0.0)),  // exact prefix+full match
      (12L, Seq(0.9, 0.1, 0.0, 0.0)))  // strong prefix match
      .toDF("vec_id", "embedding")
    val tight = graft.pipeline.Similarity
      .matryoshkaTopK(df, queryId = 0L, k = 2, prefixDims = 2, shortlist = 2)
      .as[(Long, Double)].collect().toMap
    assert(tight.keySet == Set(11L, 12L))
    assert(tight(11L) == 1.0)
    val wide = graft.pipeline.Similarity
      .matryoshkaTopK(df, queryId = 0L, k = 3, prefixDims = 2, shortlist = 3)
      .as[(Long, Double)].collect().toMap
    assert(wide.keySet == Set(10L, 11L, 12L))
    assert(wide(10L) == 0.0) // full-dim cosine of the suffix-only vector
  }
}
