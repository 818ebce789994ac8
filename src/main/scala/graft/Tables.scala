package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-provided parquet tables (see /root/repo/TESTDATA.md).
  *
  * All engine queries take an `sfDir` (scale-factor directory) and read the
  * parquet files directly — filters and projections declared downstream are
  * pushed into the parquet scan by Catalyst (verify via
  * `.explain("formatted")`: `PushedFilters` / `ReadSchema`).
  *
  * Scale notes: at 100 TB each of these would be a partitioned parquet
  * dataset (e.g. `orders` partitioned by month of `o_orderdate`,
  * `lineitem` bucketed by `l_orderkey` for shuffle-free joins with orders).
  * Nothing in this loader assumes single-file inputs — `spark.read.parquet`
  * takes directories as-is.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = apply(spark, d, "lineitem")
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects by default; read the nanos as long and convert to a microsecond
    * TimestampType with integer division (a double division would lose
    * precision above 2^53 ns).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, d: String): DataFrame = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")

  /** Register every table as a temp view (used by tests / ad-hoc SQL). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
