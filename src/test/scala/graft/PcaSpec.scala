package graft

import graft.pipeline.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the distributed PCA: the Jacobi eigensolver against analytic
  * ground truth, the fitted model against a planted dominant direction,
  * orthonormality/ordering invariants, the sign canonicalization, and
  * the projection path against hand-computable coordinates.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.indices.iterator.map(i => a(i) * b(i)).sum

  test("jacobiEigen: analytic 2x2 — values 3 and 1, vectors (1,±1)/√2") {
    val (vals, vecs) =
      Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(vecs(0)(0) - s) < 1e-12 &&
      math.abs(vecs(0)(1) - s) < 1e-12)
    // canonical sign: the tie at |±s| resolves to the LOWEST index, which
    // is made positive — so the second vector is (s, −s), never (−s, s).
    assert(math.abs(vecs(1)(0) - s) < 1e-12 &&
      math.abs(vecs(1)(1) + s) < 1e-12)
  }

  test("jacobiEigen: diagonal input returns sorted diagonal unchanged") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(vals.toSeq == Seq(5.0, 3.0, 1.0))
    assert(vecs(0).toSeq == Seq(0.0, 1.0, 0.0))
    assert(vecs(1).toSeq == Seq(0.0, 0.0, 1.0))
    assert(vecs(2).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("fit recovers a planted dominant direction") {
    // x_i = t_i·u + ε_i with u = (3,4,0,0,12)/13 and deterministic small
    // off-direction noise: PC1 must align with u to |cos| > 0.999 and
    // λ1 must carry almost all the variance.
    val u = Array(3.0, 4.0, 0.0, 0.0, 12.0).map(_ / 13.0)
    val rows = (0 until 60).map { i =>
      val t = (i - 30).toDouble
      val eps = Array(0.01 * math.sin(i.toDouble), 0.01 * math.cos(2.0 * i),
        0.02 * math.sin(3.0 * i + 1), 0.02 * math.cos(5.0 * i),
        0.01 * math.sin(7.0 * i))
      Tuple1(u.indices.map(j => t * u(j) + eps(j)).toSeq)
    }
    val df = rows.toDF("embedding")
    val model = Pca.fit(df)
    assert(model.n == 60)
    val align = math.abs(dot(model.components(0), u))
    assert(align > 0.999, s"PC1 misaligned with planted direction: $align")
    assert(model.eigenvalues(0) / model.totalVar > 0.99)
    // PC1 optimality: λ1 dominates every axis-aligned variance.
    assert(model.eigenvalues(0) + 1e-9 >= model.coordVars.max)
  }

  test("components are orthonormal, eigenvalues descending, trace = totalVar") {
    val rows = (0 until 40).map { i =>
      Tuple1(Seq(math.sin(i.toDouble), math.cos(0.7 * i),
        0.5 * math.sin(2.0 * i) + 0.3 * math.cos(0.7 * i),
        (i % 7).toDouble / 3.0))
    }
    val model = Pca.fit(rows.toDF("embedding"))
    val k = model.components.length
    for (a <- 0 until k; b <- a until k) {
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot(model.components(a), model.components(b)) - want)
        < 1e-9, s"orthonormality broken at ($a,$b)")
    }
    assert(model.eigenvalues.zip(model.eigenvalues.tail)
      .forall { case (x, y) => x >= y - 1e-12 })
    assert(math.abs(model.eigenvalues.sum - model.totalVar) < 1e-9)
  }

  test("project: hand case on an axis — centered coordinates, exact") {
    // Points (1,0),(3,0),(5,0): mean (3,0), PC1 = (1,0) ⇒ p1 = x − 3.
    val df = Seq(Tuple1(Seq(1.0, 0.0)), Tuple1(Seq(3.0, 0.0)),
      Tuple1(Seq(5.0, 0.0))).toDF("embedding")
    val model = Pca.fit(df)
    assert(math.abs(model.eigenvalues(0) - 8.0 / 3.0) < 1e-12)
    val p1 = Pca.project(df, model, k = 1)
      .select(col("p1")).as[Double].collect().sorted.toSeq
    assert(p1.zip(Seq(-2.0, 0.0, 2.0))
      .forall { case (g, w) => math.abs(g - w) < 1e-12 })
  }

  test("stats merge ≡ whole-corpus fit (delta-merge == recompute)") {
    val rows = (0 until 48).map { i =>
      Tuple1(Seq(math.sin(0.8 * i), math.cos(1.1 * i), (i % 6).toDouble,
        0.3 * math.sin(2.2 * i)))
    }
    val df = rows.toDF("embedding")
    val partA = rows.take(31).toDF("embedding")
    val partB = rows.drop(31).toDF("embedding")
    val merged = Pca.fitFromStats(
      Pca.stats(partA).merge(Pca.stats(partB)))
    val full = Pca.fit(df)
    assert(merged.n == full.n)
    assert(merged.mean.zip(full.mean)
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(merged.eigenvalues.zip(full.eigenvalues)
      .forall { case (a, b) => math.abs(a - b) < 1e-10 })
    assert(math.abs(merged.totalVar - full.totalVar) < 1e-10)
  }

  test("stats rejects a ragged corpus (mixed vector lengths) loudly") {
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0)), Tuple1(Seq(4.0, 5.0)))
      .toDF("embedding")
    val e = intercept[IllegalArgumentException] { Pca.stats(df) }
    assert(e.getMessage.contains("ragged"))
  }

  test("stats merge rejects dimension mismatch") {
    val a = Pca.stats(Seq(Tuple1(Seq(1.0, 2.0))).toDF("embedding"))
    val b = Pca.stats(Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("embedding"))
    intercept[IllegalArgumentException] { a.merge(b) }
  }

  test("saveStats/loadStats round-trips bit-identically; validates shape") {
    val df = (0 until 30).map(i =>
      Tuple1(Seq(math.sin(i.toDouble), math.cos(0.4 * i), i.toDouble / 7)))
      .toDF("embedding")
    val st = Pca.stats(df)
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_pca_stats_spec").toString
    Pca.saveStats(spark, st, path)
    val back = Pca.loadStats(spark, path)
    assert(back.n == st.n)
    assert(back.sums.sameElements(st.sums))
    assert(back.prods.zip(st.prods)
      .forall { case (a, b) => a.sameElements(b) })
    // a truncated artifact (missing triangle cells) must fail loudly
    val broken = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_pca_stats_broken").toString
    spark.read.parquet(path).limit(2)
      .write.mode("overwrite").parquet(broken)
    intercept[IllegalArgumentException] { Pca.loadStats(spark, broken) }
  }

  test("projection variance equals the eigenvalue (two paths agree)") {
    val rows = (0 until 50).map { i =>
      Tuple1(Seq(math.sin(1.3 * i), math.cos(0.9 * i), (i % 5).toDouble))
    }
    val df = rows.toDF("embedding")
    val model = Pca.fit(df)
    val vp = Pca.project(df, model, k = 1)
      .agg(var_pop(col("p1"))).head().getDouble(0)
    assert(math.abs(vp - model.eigenvalues(0)) < 1e-9)
  }

  test("stats rejects a null coordinate value loudly (ADVICE r13)") {
    // Equal-length vectors, one interior null: sum() would silently skip
    // it while the presence counts still agree — the non-null diagonal
    // count is what reds the guard.
    val df = spark.sql(
      """SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS embedding
        |UNION ALL SELECT array(4.0D, 5.0D, 6.0D)
        |UNION ALL SELECT array(7.0D, 8.0D, 9.0D)""".stripMargin)
    val e = intercept[IllegalArgumentException] { Pca.stats(df) }
    assert(e.getMessage.contains("null coordinate"))
  }

  test("loadStats rejects duplicated cells and inconsistent diag counts") {
    val df = (0 until 20).map(i =>
      Tuple1(Seq(math.sin(i.toDouble), math.cos(0.7 * i), i.toDouble / 3)))
      .toDF("embedding")
    val path = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_pca_stats_adv").toString
    Pca.saveStats(spark, Pca.stats(df), path)
    val art = spark.read.parquet(path)
    // Duplicate (0,0) and drop (0,1): the triangle COUNT still totals
    // d(d+1)/2, so only the distinct-cell check can catch it.
    val dup = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_pca_stats_dup").toString
    art.filter(!(col("i") === 0 && col("j") === 1))
      .unionByName(art.filter(col("i") === 0 && col("j") === 0))
      .write.mode("overwrite").parquet(dup)
    val e1 = intercept[IllegalArgumentException] { Pca.loadStats(spark, dup) }
    assert(e1.getMessage.contains("duplicate cell"))
    // One diagonal cnt nudged: same shape, inconsistent n.
    val skew = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_pca_stats_skew").toString
    art.withColumn("cnt",
        when(col("i") === 1 && col("j") === 1, col("cnt") + 1)
          .otherwise(col("cnt")))
      .write.mode("overwrite").parquet(skew)
    val e2 = intercept[IllegalArgumentException] { Pca.loadStats(spark, skew) }
    assert(e2.getMessage.contains("inconsistent diagonal"))
  }
}
