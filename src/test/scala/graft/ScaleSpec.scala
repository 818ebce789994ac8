package graft

import graft.scale.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level assertions for the cluster-scale layout tools: bucketed
  * joins must be shuffle-free, salting must preserve results.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val edges = (0L until 1000L).map(i => (i % 100, i)).toDF("parent", "child")
    val nodes = (0L until 100L).map(i => (i, s"n$i")).toDF("parent", "name")
    Layout.writeBucketed(edges, "b_edges", 4, Seq("parent"))
    Layout.writeBucketed(nodes, "b_nodes", 4, Seq("parent"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_edges").join(spark.table("b_nodes"), "parent")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted count equals direct count under heavy skew") {
    import spark.implicits._
    // 10k rows of one hot key + a tail.
    val skewed = (Seq.fill(10000)("hot") ++ (1 to 50).map(i => s"k$i"))
      .toDF("key")
    val direct = skewed.groupBy("key").count()
      .as[(String, Long)].collect().toMap
    val salted = Layout.saltedCount(skewed, col("key"), 8)
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
  }

  test("salted join equals plain join under heavy skew") {
    import spark.implicits._
    val fact = (Seq.fill(5000)(1L) ++ Seq(2L, 3L)).toDF("k")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val plain = fact.join(dim, "k").groupBy("v").count()
      .as[(String, Long)].collect().toMap
    val salted = Layout.saltedJoin(fact, dim, "k", 8).groupBy("v").count()
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}
