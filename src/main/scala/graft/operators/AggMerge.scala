package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: merge partial aggregates (a base
  * aggregate, insert deltas, delete retractions) into the aggregate of
  * the updated dataset WITHOUT recomputing over the base data — the
  * materialized-view-delta contract every 100 TB pipeline depends on
  * (re-aggregating a petabyte because a day's partition arrived is not a
  * plan).
  *
  * Algebra: counts and sums are abelian-group aggregates — deletions are
  * negated contributions, and merging is summation per key. The merge is
  * deliberately NOT a chain of full-outer joins (k-1 shuffles, null
  * handling per column): all parts union by name and one hash aggregate
  * sums per key — a single shuffle no matter how many parts, map-side
  * combined. Keys whose row count reaches zero are dropped (the group no
  * longer exists in the maintained view, matching what a recompute would
  * produce).
  *
  * min/max are NOT mergeable under deletion (retracting the current min
  * needs the runner-up, which only the base data knows) — callers needing
  * them must recompute those columns; the require below rejects the
  * misuse rather than silently corrupting the view.
  */
object AggMerge {

  /** Negate every numeric column except the keys — turns an aggregate of
    * deleted rows into its retraction.
    */
  def retract(agg: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = agg.columns.map { c =>
      if (keys.contains(c)) col(c) else (-col(c)).as(c)
    }
    agg.select(cols.toIndexedSeq: _*)
  }

  /** Merge partial aggregates sharing the schema (keys + summable
    * columns). `countCol` names the row-count column used for the
    * group-liveness filter.
    */
  def merge(parts: Seq[DataFrame], keys: Seq[String],
      countCol: String): DataFrame = {
    require(parts.nonEmpty, "merge requires at least one part")
    val cols = parts.head.columns.toSeq
    require(parts.forall(_.columns.toSeq == cols),
      "all parts must share the same column layout")
    require(cols.contains(countCol), s"count column $countCol missing")
    val sumCols = cols.filterNot(keys.contains)
    val unioned = parts.reduce(_ unionByName _)
    unioned.groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
      .filter(col(countCol) =!= 0)
  }
}
