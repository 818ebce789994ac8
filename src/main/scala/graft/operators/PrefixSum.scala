package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global running (prefix) sums — the cumulative sibling of
  * [[GlobalRank]]: ECDF construction (KS statistics), cumulative market
  * share, quota cutoffs over a sorted order.
  *
  * `sum(x).over(Window.orderBy(...))` collapses to ONE task — the same
  * single-partition cliff GlobalRank exists to avoid, with the same
  * two-pass cure: a range exchange gives globally ordered,
  * non-overlapping partitions; pass one computes PER-PARTITION totals
  * (one row of Longs per partition to the driver — the prefix-sum
  * analogue of zipWithIndex's count job); the totals scan-fold into
  * exclusive partition offsets, broadcast back; pass two streams each
  * partition once adding `offset + local running sum`.
  *
  * The RDD hop is the genuine per-partition-imperative case (Catalyst
  * has no partition-prefix operator), and BOTH jobs run over the SAME
  * materialized `ranged.rdd` instance — two `.rdd` calls would build two
  * independent range partitioners whose sampled boundaries need not
  * agree, silently corrupting offsets.
  *
  * Values must be LongType (exact, order-independent addition — the
  * cross-engine hash contract; float prefix sums would encode partition
  * boundaries into the low bits). Callers must pass a TOTAL order, same
  * contract as GlobalRank.
  */
object PrefixSum {

  /** Append `<col>_cum` inclusive running-sum columns for each of
    * `valueCols` (LongType) under the given total order.
    */
  def running(df: DataFrame, order: Seq[Column], valueCols: Seq[String],
      outSuffix: String = "_cum"): DataFrame = {
    require(valueCols.nonEmpty, "prefix sum needs at least one value column")
    valueCols.foreach { c =>
      require(df.schema(c).dataType == LongType,
        s"prefix sum requires BIGINT value columns; $c is " +
          df.schema(c).dataType.simpleString)
    }
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val idx = valueCols.map(ranged.schema.fieldIndex).toArray
    val base = ranged.rdd // ONE instance: both jobs share its partitioner
    val totals = base.mapPartitionsWithIndex { (pid, it) =>
      val sums = new Array[Long](idx.length)
      it.foreach { r =>
        var j = 0
        while (j < idx.length) {
          sums(j) = Math.addExact(sums(j), r.getLong(idx(j))); j += 1
        }
      }
      Iterator((pid, sums))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(new Array[Long](idx.length)) { (acc, t) =>
      acc.zip(t).map { case (a, b) => Math.addExact(a, b) }
    }.dropRight(1)
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = StructType(ranged.schema.fields ++
      valueCols.map(c => StructField(c + outSuffix, LongType,
        nullable = false)))
    val rdd = base.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        var j = 0
        while (j < idx.length) {
          run(j) = Math.addExact(run(j), r.getLong(idx(j))); j += 1
        }
        Row.fromSeq(r.toSeq ++ run.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
