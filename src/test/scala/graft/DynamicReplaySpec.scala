package graft

import graft.scenario.DynamicReplay
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the dynamic-topology replay: the mutation
  * schedule and depth-bounded chain must match paper arithmetic on a tiny
  * forest before the sf-scale oracle gate sees them.
  */
class DynamicReplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10 drones, fanout 2: 0,1 -> HQ; k -> k-2 otherwise (two chains of
  // depth 5: 0-2-4-6-8 and 1-3-5-7-9).
  private def tinyDelegation = Seq.tabulate(10) { k =>
    (k.toLong, if (k < 2) "HQ" else (k - 2).toString)
  }.toDF("drone_id", "hq_id")

  test("chain count respects the depth bound") {
    val d2 = DynamicReplay.chainCount(spark, tinyDelegation, depth = 2)
      .head().getLong(0)
    assert(d2 == 4, "2 roots + 2 second-level drones")
    val d5 = DynamicReplay.chainCount(spark, tinyDelegation, depth = 5)
      .head().getLong(0)
    assert(d5 == 10, "full forest within depth 5")
  }

  test("mutation re-roots exactly the step's modular family") {
    val mutated = DynamicReplay.mutateStep(tinyDelegation, step = 1, modulo = 5)
    val reRooted = mutated.filter(col("hq_id") === "HQ")
      .select("drone_id").as[Long].collect().toSet
    // family {1, 6} re-rooted; {0, 1} were already roots.
    assert(reRooted == Set(0L, 1L, 6L))
    // Re-rooting 6 promotes its subtree: depth-2 count gains 6 and 8.
    val d2 = DynamicReplay.chainCount(spark, mutated, depth = 2)
      .head().getLong(0)
    assert(d2 == 6, "roots {0,1,6} + children {2,3,8}")
  }

  test("turn-taking steps accumulate mutations") {
    val out = DynamicReplay.turnTaking(spark, "/root/testdata/sf0.001",
        depths = Seq(2, 3))
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(out.forall(_.getLong(2) > 0))
    // Step 2 at a deeper bound over a superset of re-rooted drones must
    // reach at least as many nodes as step 1.
    assert(out(1).getLong(2) >= out(0).getLong(2))
  }

  test("partition splits the forest and reconciliation restores it") {
    val out = DynamicReplay.partitionReconcile(spark, "/root/testdata/sf0.001",
        depth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set("split_a", "split_b", "reconciled"))
    // The reunified chain sees every node both partitions saw.
    assert(out("reconciled") >= out("split_a") + out("split_b") - 1)
  }
}
