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
    * distributed frontier walk.
    */
  val DefaultMaxEdges = 100000L

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

  /** Auto entry point: Some(closure) when the hierarchy fits the driver
    * cap (memoized per (plan, depth) — a memo hit skips the size probe
    * too), None when the caller must use the distributed walk.
    */
  def closureAuto(edges: DataFrame, maxDepth: Int,
      parentCol: String = "parent", childCol: String = "child",
      maxEdges: Long = DefaultMaxEdges): Option[DataFrame] =
    graft.PlanKeys.planKey(edges) match {
      case Some(key) =>
        val full = s"$key:$maxDepth:$parentCol:$childCol"
        Option(closureCache.get(full)).orElse {
          if (fitsDriver(edges, maxEdges)) {
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
            Some(closureCache.computeIfAbsent(full,
              _ => closureSmall(edges, maxDepth, parentCol, childCol,
                maxEdges).cache()))
          } else None
        }
      case None =>
        if (fitsDriver(edges, maxEdges))
          Some(closureSmall(edges, maxDepth, parentCol, childCol, maxEdges))
        else None
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
    rows.result().toDF("src", "dst", "lvl", "n_paths")
  }
}
