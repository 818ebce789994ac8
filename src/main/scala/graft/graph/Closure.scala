package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded transitive closure of a SMALL graph, with bag-semantics path
  * multiplicities — the broadcast-dimension side of reachability joins.
  *
  * The ABAC/WoT decision shape at scale is "huge fact side (users,
  * events) × small hierarchy (groups, org units)": the hierarchy is a
  * dimension table, so the scalable plan is to materialize its ≤d-hop
  * closure once and broadcast-join it, not to iterate a frontier walk
  * whose every level is a Spark job. A 1000-executor cluster burns more
  * wall-clock scheduling 50 tiny jobs than scanning 10^9 users against a
  * broadcast map.
  *
  * `closureSmall` collects the edge list to the driver under an explicit
  * cap — the same bounded-driver-read contract as the IVF centroid
  * ranking (Similarity.ivfTopK). Callers auto-pick: closure when the
  * hierarchy fits the cap, [[Traverse.expand]] when it does not
  * (GraphQueries.r4AbacDecision).
  *
  * Reference semantics: path COUNTS, not reachability — a diamond
  * contributes 2 (matches Traverse.expand's bag UNION ALL; reference
  * counts paths at demo_did_graph/04_web_of_trust/
  * benchmark_scenario_a.py:267-278).
  */
object Closure {

  /** Max edges collected to the driver; above this callers must use the
    * distributed closure or the frontier walk.
    */
  val DefaultMaxEdges = 100000L

  /** Edge bound for the distributed-closure middle regime: graphs too big
    * to collect but still dimension-shaped (the closure artifact stays
    * cluster-resident). Above this, callers fall back to the frontier
    * walk — a graph this size is a fact table, not a dimension.
    */
  val DefaultMaxDistributedEdges = 10000000L

  /** Preference boundary between the driver BFS and the distributed
    * build inside [[closureAuto]]: below it the driver BFS wins (ms-scale
    * build, tiny artifact — the ABAC case); above it the distributed
    * build's parallel artifact serves warm queries ~4x faster than a
    * driver-materialized one and its build parallelizes (measured at the
    * 15k-edge sf0.1 trust chain: warm 97 ms vs 366 ms; build 5.6 s vs
    * 4.2 s single-threaded — and the gap inverts further with size).
    * The 100k hard driver cap stays as the memory-safety bound for
    * explicit closureSmall callers.
    */
  val DriverPreferredMaxEdges = 10000L

  /** Cap on materialized closure rows per doubling round — the loud guard
    * against a dense graph whose reachability set explodes (closure rows
    * are bounded by edges x depth only for forest/chain shapes).
    */
  val DefaultMaxClosureRows = 50000000L

  /** `maxEdges + 1` as an Int limit, clamped: a cap at or above
    * Int.MaxValue would silently wrap `(maxEdges + 1).toInt` negative and
    * break the size guard (limit(negative) errors / truncates).
    */
  private def probeLimit(maxEdges: Long): Int =
    math.min(maxEdges, (Int.MaxValue - 1).toLong).toInt + 1

  /** True iff `edges` is small enough for the closure path (one tiny
    * count job — cheap next to the per-level jobs it avoids).
    */
  def fitsDriver(edges: DataFrame, maxEdges: Long = DefaultMaxEdges): Boolean =
    edges.limit(probeLimit(maxEdges)).count() <= maxEdges

  // Closures are index artifacts like the IVF centroids: computed once
  // per (hierarchy version, depth) and reused across decisions — at scale
  // they'd be persisted beside the hierarchy. Memoized only when the edge
  // plan has a nameable content identity (PlanKeys); a mutated snapshot
  // mints a fresh key, a driver-local edge set recomputes.
  private val closureCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Auto entry point — three regimes by hierarchy size:
    *   1. fits the driver cap → [[closureSmall]] (driver BFS, broadcast);
    *   2. fits the distributed cap → [[closureDistributed]] (log2(d)
    *      shuffle joins, cluster-resident artifact);
    *   3. else None — the caller must use the frontier walk (a graph this
    *      size is not a dimension).
    * Memoized per (plan, depth) when the edge plan has a content identity
    * — a memo hit skips the size probes too.
    */
  def closureAuto(edges: DataFrame, maxDepth: Int,
      parentCol: String = "parent", childCol: String = "child",
      maxEdges: Long = DefaultMaxEdges,
      maxDistributedEdges: Long = DefaultMaxDistributedEdges): Option[DataFrame] = {
    def build(): Option[DataFrame] =
      // Driver BFS only below BOTH the caller's cap and the measured
      // preference boundary — past ~10k edges the distributed build's
      // parallel artifact wins warm queries even though the graph would
      // still fit the driver (see DriverPreferredMaxEdges).
      if (fitsDriver(edges, math.min(maxEdges, DriverPreferredMaxEdges)))
        Some(closureSmall(edges, maxDepth, parentCol, childCol, maxEdges))
      else if (fitsDriver(edges, maxDistributedEdges))
        // Size-probe reuse: fitsDriver only runs a bounded count, it does
        // not collect; the distributed build never moves edges to the
        // driver.
        closureDistributed(edges, maxDepth, parentCol, childCol)
      else None
    graft.PlanKeys.planKey(edges) match {
      case Some(key) =>
        // Caps are part of the key: callers forcing a tier (a zero driver
        // cap routes to the distributed build) must not be served an
        // artifact another cap configuration built, even though the rows
        // are provably identical — the memo entry's lifecycle and build
        // path belong to the configuration that requested it.
        val full = s"$key:$maxDepth:$parentCol:$childCol:$maxEdges:$maxDistributedEdges"
        Option(closureCache.get(full)).orElse {
          build().map { closure =>
            // Bounded like the other artifact memos: evicting wholesale
            // past 32 entries, unpersisting the cached closures so the
            // block store doesn't accumulate dead columnar batches in a
            // resident service replaying many hierarchy versions.
            if (closureCache.size > 32) {
              closureCache.values.forEach(df =>
                try df.unpersist() catch { case _: Exception => () })
              closureCache.clear()
            }
            // Memo-owned .cache(): a LocalRelation closure re-pays a
            // single-threaded driver scan of up to maxDepth×maxEdges rows
            // on EVERY query otherwise; cached, warm queries read columnar
            // batches. Deliberately not CacheRegistry-registered — the
            // artifact's lifetime is the memo entry's, like the IVF index.
            closureCache.computeIfAbsent(full, _ => closure.cache())
          }
        }
      case None => build()
    }
  }

  /** Distributed bounded bag closure via prefix-decomposition doubling —
    * the middle regime between the driver BFS and the frontier walk.
    *
    * Invariant: after a round extending coverage from L to L+ext, the
    * accumulator holds EVERY (src, dst, lvl, n_paths) with lvl <= L+ext.
    * A walk of length m in (L, L+ext] splits uniquely at its L-th node
    * into an exactly-L prefix and a suffix of length m-L <= ext, so
    * joining the exact-L slice against the <=ext slice and summing
    * multiplicity products over the split node counts every walk exactly
    * once. ceil(log2(maxDepth)) joins instead of maxDepth-1 frontier
    * levels — at cluster scale that is ~5 shuffle stages for depth 20
    * instead of 20 scheduler round-trips.
    *
    * Multiplicities are computed in DECIMAL(38,0) and checked back into
    * Long range — a dense graph under the edge cap can push bag counts
    * past 2^63, and this path must fail as loudly as closureSmall's
    * Math.addExact does (same contract, reference path-count semantics).
    *
    * Each round localCheckpoints the accumulator: lineage stays one round
    * deep and the per-round row-count guard (`maxRows`) doubles as the
    * materialization barrier. Returns None when the closure exceeds
    * `maxRows` — the graph is too dense for a materialized closure and
    * the caller must walk.
    */
  def closureDistributed(edges: DataFrame, maxDepth: Int,
      parentCol: String = "parent", childCol: String = "child",
      maxRows: Long = DefaultMaxClosureRows): Option[DataFrame] = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    var p = edges.select(col(parentCol).as("src"), col(childCol).as("dst"),
        lit(1).as("lvl"), lit(1L).cast(dec).as("n_paths"))
      .localCheckpoint()
    var covered = 1
    while (covered < maxDepth) {
      val ext = math.min(covered, maxDepth - covered)
      val prefix = p.filter(col("lvl") === covered)
        .select(col("src"), col("dst").as("mid"), col("n_paths").as("n_a"))
      val suffix = p.filter(col("lvl") <= ext)
        .select(col("src").as("mid"), col("dst"), col("lvl"),
          col("n_paths").as("n_b"))
      val grown = prefix.join(suffix, "mid")
        .groupBy(col("src"), col("dst"), (col("lvl") + covered).as("lvl"))
        .agg(sum(col("n_a") * col("n_b")).as("n_paths"))
      val prev = p
      p = p.unionByName(grown.select("src", "dst", "lvl", "n_paths"))
        .localCheckpoint()
      // The new checkpoint materialized eagerly, so the previous round's
      // blocks are dead — release them now instead of orphaning
      // ceil(log2(d)) copies of the closure in executor storage.
      prev.unpersist()
      covered += ext
      if (p.count() > maxRows) return None
    }
    // Loud overflow check, closureSmall contract parity: a null decimal
    // (overflowed 38 digits) or a value past Long range means the bag
    // multiplicities are not representable — never silently wrap.
    val bad = p.filter(col("n_paths").isNull ||
      col("n_paths") > lit(Long.MaxValue).cast(dec)).limit(1).count()
    if (bad > 0) throw new ArithmeticException(
      "closureDistributed: path multiplicity overflow — graph too dense " +
        "for bag closure")
    // Cluster the artifact like the driver tier: range-partitioned on src
    // and sorted, the memo's .cache() stores batches whose src/dst stats
    // let a point probe prune to ~one batch (measured on the sf0.1 3M-row
    // closure: the probe reads one partition instead of 32).
    Some(p.select(col("src"), col("dst"), col("lvl"),
        col("n_paths").cast("long").as("n_paths"))
      .repartitionByRange(edges.sparkSession.sparkContext.defaultParallelism,
        col("src"), col("dst"))
      .sortWithinPartitions(col("src"), col("dst")))
  }

  /** All (src, dst, lvl, n_paths) with 1 <= lvl <= maxDepth and n_paths
    * the number of distinct walks src→dst of length lvl. Rows appear once
    * per (src, dst, lvl) — the bag cardinality rides in n_paths, so
    * `sum(n_paths)` over a join equals `count(*)` over the expanded walk.
    */
  def closureSmall(edges: DataFrame, maxDepth: Int,
      parentCol: String = "parent", childCol: String = "child",
      maxEdges: Long = DefaultMaxEdges): DataFrame = {
    val spark = edges.sparkSession
    val es = edges.select(parentCol, childCol).limit(probeLimit(maxEdges))
      .collect().map(r => (r.getString(0), r.getString(1)))
    require(es.length <= maxEdges,
      s"closureSmall: graph exceeds $maxEdges edges — use Traverse.expand")
    val adj: Map[String, Array[String]] =
      es.groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2) }
    val srcs = (es.map(_._1) ++ es.map(_._2)).distinct
    val rows = Seq.newBuilder[(String, String, Int, Long)]
    srcs.foreach { src =>
      // Multiplicity BFS: frontier counts walks, not visited nodes.
      var frontier = Map(src -> 1L)
      var lvl = 1
      while (lvl <= maxDepth && frontier.nonEmpty) {
        val next = scala.collection.mutable.Map[String, Long]()
        frontier.foreach { case (node, cnt) =>
          adj.getOrElse(node, Array.empty).foreach { c =>
            // addExact: a dense graph under the edge cap can grow bag
            // multiplicities past Long range (~b^lvl for branching b);
            // a silent wrap would return wrong path counts where the
            // distributed walk would at worst OOM loudly.
            next(c) = try Math.addExact(next.getOrElse(c, 0L), cnt)
              catch { case _: ArithmeticException =>
                throw new ArithmeticException(
                  s"closureSmall: path multiplicity overflow at lvl $lvl " +
                    s"from $src — graph too dense for bag closure")
              }
          }
        }
        next.foreach { case (dst, cnt) => rows += ((src, dst, lvl, cnt)) }
        frontier = next.toMap
        lvl += 1
      }
    }
    import spark.implicits._
    val out = rows.result()
    val df = out.toDF("src", "dst", "lvl", "n_paths")
    // A driver-built closure is a single-partition LocalRelation; once it
    // grows past trivial size, every warm query over the cached artifact
    // would scan it on one core (measured: 3M rows ≈ 3.2 s/query at
    // local[32] vs 0.14 s spread). Spread big artifacts at build time —
    // and CLUSTER them: range-partitioned on src and sorted within
    // partitions, the cached columnar batches carry tight src/dst
    // min/max stats, so a reachability point probe (filter src=X) prunes
    // to ~one batch instead of scanning the whole artifact
    // (InMemoryTableScan batch pruning). One shuffle, paid once at
    // build; tiny hierarchies (the common ABAC case) stay
    // single-partition and skip the per-query many-task overhead.
    if (out.length > 10000)
      df.repartitionByRange(spark.sparkContext.defaultParallelism,
          col("src"), col("dst"))
        .sortWithinPartitions(col("src"), col("dst"))
    else df
  }
}
