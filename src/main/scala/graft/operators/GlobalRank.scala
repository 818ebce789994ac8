package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global row numbering — the primitive behind sorted-order
  * algorithms (sorted-neighborhood dedup, global top-N cursors,
  * rank-banded self-joins).
  *
  * The naive `row_number().over(Window.orderBy(...))` collapses the
  * whole table into ONE task — the classic single-partition cliff that
  * works at test scale and dies at 100 TB. This operator is the
  * standard two-pass form instead: a range exchange puts globally
  * ordered, non-overlapping key ranges in separate partitions
  * (distributed sort, every task bounded), then `zipWithIndex` runs
  * one lightweight count job over the sorted partitions and assigns
  * each row `partition offset + local index` — no second shuffle, no
  * driver materialization beyond one Long per partition.
  *
  * The RDD hop is the genuine per-partition-imperative case: Catalyst
  * has no "prefix sum of partition sizes" operator, and a window over
  * `spark_partition_id()` would re-shuffle. Rows pass through opaque,
  * so codegen resumes on the downstream plan.
  *
  * Determinism: callers must pass a TOTAL order (include a unique
  * tie-break column). Range partitioner boundary sampling only moves
  * rows between adjacent partitions — the concatenated global order,
  * and therefore every assigned rank, is identical for any boundary
  * choice once the order is total.
  */
object GlobalRank {

  /** Append a 1-based global rank column under the given total order. */
  def rowNumber(df: DataFrame, order: Seq[Column],
      out: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = StructType(
      ranged.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
