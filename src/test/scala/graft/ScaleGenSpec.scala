package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the sf1 decade generator ([[graft.scale.ScaleGen]]),
  * checked on a factor-2 replication of sf0.001: the downstream engine
  * derives delegation forests from key CONTIGUITY
  * (DynamicReplay.baseDelegation) and graph edges from FK validity
  * (GraphData.hierarchyEdges), so a generator that breaks either would
  * silently corrupt the scale sweep rather than fail it.
  */
class ScaleGenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen_spec").toString
    graft.scale.ScaleGen.generate(spark, "/root/testdata/sf0.001", dir, 2)
    dir
  }

  test("replicated customer keys stay contiguous 0..N*f-1") {
    val src = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val rep = spark.read.parquet(s"$out/customer.parquet")
    val n = src.count()
    assert(rep.count() == 2 * n)
    val r = rep.agg(min(col("c_custkey")), max(col("c_custkey")),
      countDistinct(col("c_custkey"))).head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 2 * n - 1)
    assert(r.getLong(2) == 2 * n)
  }

  test("every replicated FK lands on a real parent in the same copy") {
    val cust = spark.read.parquet(s"$out/customer.parquet")
    val ord = spark.read.parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$out/lineitem.parquet")
    val orphanOrders = ord.join(cust,
      ord("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(orphanOrders == 0, s"$orphanOrders orders without a customer")
    val orphanLines = li.join(ord,
      li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    assert(orphanLines == 0, s"$orphanLines lineitems without an order")
    // Copy discipline, not just global validity: an order in copy 1 must
    // reference a copy-1 customer (key >= stride).
    val nCust = cust.count() / 2
    val nOrd = ord.count() / 2
    val crossCopy = ord.filter(
      (col("o_orderkey") >= nOrd && col("o_custkey") < nCust) ||
      (col("o_orderkey") < nOrd && col("o_custkey") >= nCust)).count()
    assert(crossCopy == 0, s"$crossCopy orders reference the wrong copy")
  }

  test("event ids/users shift and the replicated timeline stays disjoint") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val rep = spark.read.parquet(s"$out/events.parquet")
    val n = src.count()
    assert(rep.count() == 2 * n)
    assert(rep.agg(countDistinct(col("event_id"))).head().getLong(0) == 2 * n)
    // Copy 1's earliest ts must be after copy 0's latest. Normalize ts to
    // epoch-micros longs first — the generated decade writes
    // TIMESTAMP(MICROS) whatever the source encoding was.
    val bounds = graft.scale.ScaleGen.tsToMicros(rep)
      .withColumn("copy", when(col("event_id") < n, 0).otherwise(1))
      .groupBy(col("copy")).agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
      .orderBy(col("copy")).collect()
    assert(bounds(1).getLong(1) > bounds(0).getLong(2),
      "replicated event timelines overlap")
  }

  test("pipeline corpora replicate into copy-disjoint blocks") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rep = spark.read.parquet(s"$out/documents.parquet")
    val n = src.count()
    assert(rep.count() == 2 * n)
    assert(rep.agg(countDistinct(col("doc_id"))).head().getLong(0) == 2 * n)
    // Copy 0 verbatim; copy 1's blocks carry the copy suffix, so no
    // block ever spans copies (the invariant that keeps block-scoped
    // dedup output linear in the replication factor).
    val copy0 = rep.filter(col("doc_id") < n).select("doc_id", "text", "source")
    assert(copy0.exceptAll(src.select("doc_id", "text", "source")).count() == 0)
    val crossBlock = rep.filter(col("doc_id") < n)
      .select("source").distinct()
      .join(rep.filter(col("doc_id") >= n).select("source").distinct(),
        "source").count()
    assert(crossBlock == 0, "a source block spans copies")

    val esrc = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val erep = spark.read.parquet(s"$out/embeddings.parquet")
    val m = esrc.count()
    assert(erep.count() == 2 * m)
    assert(erep.agg(countDistinct(col("vec_id"))).head().getLong(0) == 2 * m)
    val lblCross = erep.filter(col("vec_id") < m).select("label").distinct()
      .join(erep.filter(col("vec_id") >= m).select("label").distinct(),
        "label").count()
    assert(lblCross == 0, "a label block spans copies")
    // Copy-1 vectors are epsilon-shifted (distinct from copy 0), so the
    // global ANN scan ranks real vectors, not tie-broken clones.
    val v0 = erep.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0)
    val v0c = erep.filter(col("vec_id") === m).select("embedding")
      .head().getSeq[Float](0)
    assert(v0 != v0c, "replicated embedding identical to its source")
  }

  test("dimension tables are copied verbatim") {
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val rep = spark.read.parquet(s"$out/nation.parquet")
    assert(rep.count() == src.count())
    assert(rep.exceptAll(src).count() == 0)
  }
}
