package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed principal-component analysis over an embedding column —
  * the dimensionality-reduction pass a large curation stack runs before
  * clustering / SemDeDup-style semantic work (the SemDeDup paper itself
  * PCA-whitens its embeddings before k-means).
  *
  * Shaped for 100 TB the same way the covariance algebra factors:
  *  - The DATA-sized work is one declarative aggregate: every row
  *    contributes its d(d+1)/2 upper-triangle second moments via a
  *    double `posexplode`, and the groupBy(i, j) hash-aggregate
  *    collapses them map-side — what shuffles is O(partitions · d²)
  *    cells, never rows. CPU is honestly n·d²/2 multiply-adds (that is
  *    PCA's arithmetic lower bound without sketching); a deployment
  *    with very large d trades this scan for a randomized-sketch pass,
  *    which composes on top of the same moment contract.
  *  - The MODEL-sized work — assembling the d×d covariance and running
  *    the eigensolve — is a bounded driver step (d ≤ a few thousand:
  *    d² doubles, the kCenterCoreset bounded-collect discipline), cyclic
  *    Jacobi so the result is a pure deterministic function of the
  *    moments, no seeded/iterative-init drift.
  *  - Projection back over the corpus is a scan-stage `zip_with` +
  *    `aggregate` per component against literal component arrays —
  *    whole-stage-codegen HOFs, zero shuffle.
  *
  * Eigenvector signs are canonicalized (the largest-|weight| coordinate
  * is made positive, lowest index on ties) so the components — which are
  * only defined up to sign — are reproducible across runs and engines.
  */
object Pca {

  /** Fitted model: row count, per-coordinate population mean and
    * variance, eigenvalues descending, and matching unit eigenvectors
    * (one per row of `components`), sign-canonicalized.
    */
  final case class Model(n: Long, mean: Array[Double],
      coordVars: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    /** Trace of the covariance = total variance explained by all PCs. */
    def totalVar: Double = coordVars.sum
  }

  /** Raw sufficient statistics of a corpus for PCA: the row count,
    * per-coordinate sums, and the symmetric second-moment matrix. These
    * are SUMS, so they merge exactly (`merge` is elementwise addition) —
    * the incremental contract: an arriving ingest batch contributes one
    * O(batch) scan and the refit is a driver-side O(d³), no corpus
    * re-scan. Same algebra as the AggMerge operator's delta-merge ≡
    * recompute discipline.
    *
    * Precision contract: covariance assembles as S/n − m·mᵀ (the naive
    * moment form — the price of exact mergeability). It loses ~2·log₁₀
    * (|mean|/stddev) decimal digits to cancellation, which is nothing
    * for roughly unit-scale embeddings (the intended input) but matters
    * for data whose mean dwarfs its spread — pre-shift such a corpus by
    * a constant (any constant: the covariance is shift-invariant, so
    * subtracting an approximate center before [[stats]] preserves the
    * merge algebra exactly).
    */
  final case class Stats(n: Long, sums: Array[Double],
      prods: Array[Array[Double]]) {
    def dim: Int = sums.length
    def merge(o: Stats): Stats = {
      require(o.dim == dim,
        s"Pca.Stats.merge: dimension mismatch ($dim vs ${o.dim})")
      Stats(n + o.n,
        Array.tabulate(dim)(i => sums(i) + o.sums(i)),
        Array.tabulate(dim, dim)((i, j) => prods(i)(j) + o.prods(i)(j)))
    }
  }

  /** One pass over `df`: the (i ≤ j) second moments, per-coordinate sums
    * and the count come back as one d(d+1)/2-row aggregate.
    */
  def stats(df: DataFrame, vecCol: String = "embedding"): Stats = {
    val v = df.select(col(vecCol).cast("array<double>").as("v"))
    val rows = v
      .select(col("v"), posexplode(col("v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("v")).as(Seq("j", "xj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("xi") * col("xj")).as("s"),
        sum(when(col("j") === col("i"), col("xi")).otherwise(lit(0.0)))
          .as("m"),
        sum(when(col("j") === col("i"), 1L).otherwise(0L)).as("cnt"),
        sum(when(col("j") === col("i") && col("xi").isNotNull, 1L)
          .otherwise(0L)).as("nn"))
      .collect() // bounded: d(d+1)/2 cells, never data-sized
    require(rows.nonEmpty, "Pca.stats: empty input")
    val d = rows.iterator.map(_.getInt(0)).max + 1
    val s = Array.ofDim[Double](d, d)
    val m = new Array[Double](d)
    val diagCnt = new Array[Long](d)
    val diagNonNull = new Array[Long](d)
    rows.foreach {
      case Row(i: Int, j: Int, sij: Double, mi: Double, c: Long, nn: Long) =>
        s(i)(j) = sij; s(j)(i) = sij
        if (i == j) { m(i) = mi; diagCnt(i) = c; diagNonNull(i) = nn }
    }
    // A ragged corpus (mixed vector lengths) populates the high
    // coordinates from fewer rows than the low ones — the moments would
    // assemble into a silently wrong covariance. The per-coordinate
    // diagonal counts detect it exactly: they must all equal n. A NULL
    // element inside a vector is the same hazard in disguise — sum()
    // skips it while the position still explodes, so the presence count
    // alone would pass; the non-null count pins it.
    val n = diagCnt(0)
    require(n > 0, "Pca.stats: zero rows")
    require(diagCnt.forall(_ == n),
      s"Pca.stats: ragged input — coordinate row-counts " +
        s"${diagCnt.distinct.mkString(",")} differ (mixed vector lengths?)")
    require(diagNonNull.indices.forall(i => diagNonNull(i) == n),
      s"Pca.stats: null coordinate values — non-null counts " +
        s"${diagNonNull.distinct.mkString(",")} vs row count $n " +
        s"(a null element would silently drop from the moments)")
    Stats(n, m, s)
  }

  /** Assemble the model from sufficient statistics: covariance is
    * cov(i,j) = S_ij/n − m_i·m_j (population form — the var_pop the
    * twin's oracle replays), then the deterministic Jacobi eigensolve.
    */
  def fitFromStats(st: Stats): Model = {
    val d = st.dim
    val mean = st.sums.map(_ / st.n)
    val cov = Array.tabulate(d, d)((i, j) =>
      st.prods(i)(j) / st.n - mean(i) * mean(j))
    val (vals, vecs) = jacobiEigen(cov)
    Model(st.n, mean, Array.tabulate(d)(i => cov(i)(i)), vals, vecs)
  }

  /** Fit the full PCA model from one pass over `df`. */
  def fit(df: DataFrame, vecCol: String = "embedding"): Model =
    fitFromStats(stats(df, vecCol))

  /** Persist sufficient statistics as a parquet artifact (the
    * pqSaveIndex / saveNearDupIndex discipline: the moments ARE the
    * index at rest — at 100 TB the corpus scan is the cost, and an
    * ingest batch must update the model without repeating it). Layout:
    * one row per (i ≤ j) cell — (i, j, s, m, cnt) with m/cnt carried on
    * the diagonal — exactly the shape of the [[stats]] aggregate, so
    * `loadStats(saveStats(stats(df)))` reassembles bit-identically.
    */
  def saveStats(spark: org.apache.spark.sql.SparkSession, st: Stats,
      path: String): Unit = {
    import spark.implicits._
    val cells = for { i <- 0 until st.dim; j <- i until st.dim } yield
      (i, j, st.prods(i)(j),
        if (i == j) st.sums(i) else 0.0,
        if (i == j) st.n else 0L)
    cells.toDF("i", "j", "s", "m", "cnt")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Reload persisted sufficient statistics; validates the artifact is
    * a complete (i ≤ j) triangle of DISTINCT cells whose diagonal counts
    * all agree, so a truncated / duplicated / foreign parquet fails
    * loudly instead of fitting a wrong model (a duplicate (i,j) cell
    * plus a missing one can total the right row count — the distinct
    * check mirrors the stats() ragged guard at load time).
    */
  def loadStats(spark: org.apache.spark.sql.SparkSession,
      path: String): Stats = {
    val rows = spark.read.parquet(path)
      .select(col("i"), col("j"), col("s"), col("m"), col("cnt"))
      .collect()
    require(rows.nonEmpty, s"Pca.loadStats: empty artifact at $path")
    val d = rows.iterator.map(_.getInt(0)).max + 1
    require(rows.length == d * (d + 1) / 2,
      s"Pca.loadStats: expected ${d * (d + 1) / 2} triangle cells for " +
        s"dim $d, found ${rows.length} — artifact incomplete or foreign")
    val s = Array.ofDim[Double](d, d)
    val m = new Array[Double](d)
    val diagCnt = new Array[Long](d)
    val seen = new java.util.HashSet[Long]()
    rows.foreach { case Row(i: Int, j: Int, sij: Double, mi: Double, c: Long) =>
      require(i >= 0 && j >= i && j < d,
        s"Pca.loadStats: cell ($i,$j) outside the dim-$d upper triangle")
      require(seen.add(i.toLong * d + j),
        s"Pca.loadStats: duplicate cell ($i,$j) — artifact corrupt")
      s(i)(j) = sij; s(j)(i) = sij
      if (i == j) { m(i) = mi; diagCnt(i) = c }
    }
    val n = diagCnt(0)
    require(n > 0, s"Pca.loadStats: zero-count artifact at $path")
    require(diagCnt.forall(_ == n),
      s"Pca.loadStats: inconsistent diagonal counts " +
        s"${diagCnt.distinct.mkString(",")} — artifact corrupt")
    Stats(n, m, s)
  }

  /** Append projection columns p1..pk = (x − mean)·v_c for the top-`k`
    * components — per-row `zip_with`/`aggregate` against literal
    * component arrays (codegen HOFs), the mean shift folded into one
    * driver-computed constant per component. Zero shuffle.
    */
  def project(df: DataFrame, model: Model, k: Int,
      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= model.components.length,
      s"need 1 <= k <= ${model.components.length}, got $k")
    val x = col(vecCol).cast("array<double>")
    val projCols = (0 until k).map { c =>
      val comp = model.components(c)
      val shift = comp.indices.iterator.map(j => comp(j) * model.mean(j)).sum
      (aggregate(
        zip_with(x, typedLit(comp.toSeq), (xi, ci) => xi * ci),
        lit(0.0), (acc, e) => acc + e) - lit(shift)).as(s"p${c + 1}")
    }
    df.select(df.columns.map(col).toIndexedSeq ++ projCols: _*)
  }

  /** Cyclic Jacobi eigensolve of a symmetric matrix: sweeps of (p, q)
    * plane rotations until the off-diagonal Frobenius mass falls below
    * 1e-14 of the total (or 100 sweeps — Jacobi converges quadratically,
    * real covariances take < 15). Returns eigenvalues descending with
    * matching unit eigenvectors, sign-canonicalized. Deterministic:
    * fixed sweep order, no randomized init.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val frob = math.sqrt(a0.iterator.flatten.map(x => x * x).sum)
    val tol = math.max(frob, 1e-300) * 1e-14
    def offMass(): Double = {
      var o = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { o += 2 * a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(o)
    }
    var sweep = 0
    while (sweep < 100 && offMass() > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { c =>
      val vec = Array.tabulate(d)(r => v(r)(c))
      // canonical sign: the largest-|weight| coordinate positive
      val pivot = vec.indices.maxBy(j => (math.abs(vec(j)), -j))
      if (vec(pivot) < 0) vec.map(x => -x) else vec
    }.toArray
    (vals, vecs)
  }
}
