package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB deployment (SURVEY.md §4
  * "Distribution/shuffle" and PLANS.md design notes). The reference tunes
  * PostgreSQL with B-tree indexes on the join keys
  * (03_equalization/setup_scenario_a.py:69, setup_scenario_b.py:94-95);
  * Spark's equivalents are bucketed storage (shuffle-free co-located
  * joins) and salting (skew spreading) — both demonstrated and
  * plan-asserted in ScaleSpec.
  */
object Layout {

  /** Write a DataFrame as a bucketed table: rows are hash-clustered by
    * `keys` into `numBuckets` files per partition, so joins and
    * aggregations on those keys need NO shuffle on this side — the
    * cluster-scale replacement for the per-level edge shuffle in deep
    * traversals (the edge table is written once, bucketed by `parent`,
    * and every frontier join co-locates).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
      keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Two-phase salted aggregation for skewed keys: partial-aggregate on
    * (key, salt) to spread one hot key over `salts` reducers, then final
    * aggregate on key. Sum/count compose; the caller provides both
    * phases' aggregate columns.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.groupBy(key.as("__k"), pmod(xxhash64(monotonically_increasing_id()), lit(salts)).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as("n"))
      .select(col("__k").as("key"), col("n"))

  /** Salted join for a skewed fact⋈dim: the fact side gets a random salt
    * in [0, salts), the dim side is exploded `salts` times, and the join
    * key becomes (key, salt) — one hot key spreads across `salts` tasks.
    * AQE's skew-join handles moderate skew automatically; explicit salting
    * is for the pathological keys AQE splitting can't fix (e.g. one key =
    * half the table).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
