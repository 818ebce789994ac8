package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants + plan-shape pins for the round-10 relational
  * additions (set ops, anti/semi joins, top-k per group, sliding
  * windows). The oracle hash-compare is the strong gate; these pin the
  * algebraic properties and the physical-plan shapes that matter at
  * scale.
  */
class RelOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import graft.queries.{RelQueries, StreamQueries}

  private def userSet(eventType: String, minValue: Double = -1): Set[Long] = {
    Tables.events(spark, sf)
      .filter(col("event_type") === eventType && col("value") > minValue)
      .select(col("user_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("set_intersect == set-theoretic intersection of the distinct sides") {
    val got = RelQueries.setIntersect(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == (userSet("signup") intersect userSet("purchase")))
  }

  test("set_except == set difference; non-empty; disjoint from subtracted side") {
    val got = RelQueries.setExcept(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val sub = userSet("purchase", 95)
    assert(got == (userSet("click", 95) diff sub))
    assert(got.nonEmpty, "gate must not be trivially empty")
    assert((got intersect sub).isEmpty)
  }

  test("anti + semi on the same key partition the left table exactly") {
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
    val anti = RelQueries.j14AntiJoin(spark, sf)
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti.count() > 0, "gate must not be trivially empty")
    assert(anti.count() + semi == c.count())
  }

  test("semi join never multiplies: output keys are unique") {
    val df = RelQueries.j15SemiJoin(spark, sf)
    assert(df.count() == df.select("p_partkey").distinct().count())
  }

  test("anti/semi joins plan as hash joins, never nested loops") {
    for (df <- Seq(RelQueries.j14AntiJoin(spark, sf),
                   RelQueries.j15SemiJoin(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop"), plan.linesIterator.take(8).mkString("\n"))
    }
  }

  test("o5 top-k: every group has at most 3 rows, ranked by price desc") {
    val rows = RelQueries.o5TopkPerGroup(spark, sf).collect()
    val byGroup = rows.groupBy(_.getString(1))
    assert(byGroup.values.forall(_.length <= 3))
    byGroup.values.foreach { g =>
      val prices = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("o5 plans with WindowGroupLimit (map-side top-k prune)") {
    val plan = RelQueries.o5TopkPerGroup(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("w4 sliding windows: every event lands in exactly duration/slide buckets") {
    val total = StreamQueries.w4SlidingCounts(spark, sf)
      .agg(sum(col("n"))).head().getLong(0)
    assert(total == 2 * Tables.events(spark, sf).count())
  }

  test("a8 cube emits all four strata with consistent totals") {
    val l = Tables.lineitem(spark, sf)
    val rows = RelQueries.a8Cube(spark, sf).collect()
    val flags = l.select("l_returnflag").distinct().count()
    val stats = l.select("l_linestatus").distinct().count()
    val pairs = l.select("l_returnflag", "l_linestatus").distinct().count()
    assert(rows.length == pairs + flags + stats + 1)
    // Grand-total stratum equals the table count.
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getLong(3) == l.count())
  }

  test("a9 having keeps exactly the groups above a 1/5 share") {
    val o = Tables.orders(spark, sf)
    val tot = o.count()
    val want = o.groupBy(col("o_orderpriority")).count()
      .collect().filter(_.getLong(1) > tot / 5.0).map(_.getString(0)).toSet
    val got = RelQueries.a9Having(spark, sf)
      .collect().map(_.getString(0)).toSet
    assert(got == want && got.nonEmpty && got.size < 5)
  }

  test("a10 rows are exactly the orders above their customer's mean") {
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byCust = o.groupBy(_._2).map { case (c, rows) =>
      c -> rows.map(r => BigDecimal(r._3).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum / rows.length
    }
    val want = o.filter { case (_, c, p) =>
      BigDecimal(p).setScale(2, BigDecimal.RoundingMode.HALF_UP) > byCust(c)
    }.map(_._1).toSet
    val got = RelQueries.a10CorrSubquery(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("o6 ntile buckets are balanced and price-monotone per group") {
    val rows = RelQueries.o6Ntile(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getInt(3), r.getLong(0)))
    rows.groupBy(_._1).values.foreach { g =>
      val sizes = g.groupBy(_._3).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, "unbalanced ntile buckets")
      // Bucket assignment respects the (price, key) window ordering.
      val sorted = g.sortBy(r => (r._2, r._4))
      assert(sorted.map(_._3).sameElements(sorted.map(_._3).sorted))
    }
  }

  test("set_union_distinct equals the set-theoretic union") {
    val got = RelQueries.setUnionDistinct(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got == (userSet("signup") union userSet("purchase")))
  }

  test("mm4 groups are genuine multi-document collisions") {
    val rows = graft.queries.PipelineQueries.mm4BinaryDedup(spark, sf)
      .collect()
    assert(rows.nonEmpty, "gate must not be trivially empty")
    assert(rows.forall(_.getLong(1) >= 2))
    val fps = rows.map(_.getString(0))
    assert(fps.distinct.length == fps.length)
  }

  test("w4 window starts align to the slide, not the duration") {
    val starts = StreamQueries.w4SlidingCounts(spark, sf)
      .select(col("w_start_ms")).distinct()
      .collect().map(_.getLong(0))
    assert(starts.forall(_ % 3600000L == 0))
    // Consecutive starts differ by the 1h slide somewhere (not only 2h).
    val sorted = starts.sorted
    val diffs = sorted.zip(sorted.tail).map { case (a, b) => b - a }
    assert(diffs.contains(3600000L))
  }

  test("sk3 bloom bound holds and is deterministic") {
    val a = RelQueries.sk3BloomBound(spark, sf).collect()
    assert(a.length == 1 && a.head.getBoolean(0),
      "no false negatives; fp rate within 3x fpp")
    val b = RelQueries.sk3BloomBound(spark, sf).collect()
    assert(b.head.getBoolean(0) == a.head.getBoolean(0),
      "bloom build must be deterministic (fixed hashing, data-driven size)")
  }

  test("sk4 count-min estimates sit in the [exact, exact + eps*N] band") {
    val r = RelQueries.sk4CmsBound(spark, sf).collect()
    assert(r.length == 1 && r.head.getBoolean(0))
  }

  test("null-safe join keeps NULL keys, covers every row, and stays a hash join") {
    val df = RelQueries.j20NullSafeJoin(spark, sf)
    val rows = df.collect().map(r =>
      (if (r.isNullAt(0)) None else Some(r.getString(0))) -> r.getLong(1))
      .toMap
    // NULL matched the dimension's NULL row instead of dropping.
    assert(rows.contains(None) && rows(None) > 0)
    // Inner null-safe join against the complete key set loses nothing.
    assert(rows.values.sum == Tables.lineitem(spark, sf).count())
    // The 100 TB property: EqualNullSafe must plan as a HASH join, not
    // the nested loop the OR-rewrite would produce.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("q3/q5 plans: pushed date filters, broadcast dims, top-k operator") {
    val q3 = RelQueries.q3ShippingPriority(spark, sf)
    val p3 = q3.queryExecution.executedPlan.toString
    assert(p3.contains("TakeOrderedAndProject"),
      "top-10 must plan as TakeOrderedAndProject, not sort+limit stages")
    assert(p3.contains("BroadcastHashJoin"), "dimension join must broadcast")
    assert(p3.contains("PushedFilters") &&
      (p3.contains("l_shipdate") || p3.contains("GreaterThan")),
      "ship-date filter must reach the parquet scan")
    assert(q3.collect().length == 10)

    val q5 = RelQueries.q5NationVolume(spark, sf)
    val p5 = q5.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(p5).length
    assert(nBroadcast >= 3,
      s"customer/supplier/nation sides must broadcast, saw $nBroadcast")
    assert(!p5.contains("CartesianProduct") &&
      !p5.contains("BroadcastNestedLoopJoin"), p5.take(400))
    // Revenue is exact-DECIMAL summed: both engines hash-match (gate);
    // here pin that all revenues are positive and ordered descending.
    val rows = q5.collect().map(_.getDouble(1))
    assert(rows.forall(_ > 0) &&
      rows.zip(rows.tail).forall { case (a, b) => a >= b })
  }

  test("join-size sample: subset sum, unbiased scale-up, sane ratio") {
    val r = RelQueries.sk7JoinSizeSample(spark, sf).head()
    val (exact, sampled, estimate, ratio) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(sampled <= exact, "a key-subset sum can never exceed the total")
    assert(estimate == sampled * 4)
    assert(ratio > 0.3 && ratio < 3.0,
      s"25% key sample should estimate within a small factor, got $ratio")
    assert(exact > 0, "fixture must have a non-empty join")
  }

  test("p10 unwind: ordinals reconstruct every source list; no shuffle") {
    val got = RelQueries.p10Unwind(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rebuilt = got.groupBy(_._1).map { case (k, g) =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).sameElements(1L to sorted.length),
        s"part $k: ordinals must be 1..n contiguous")
      k -> sorted.map(_._2).mkString(" ")
    }
    val names = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt.size == names.size, "every part must unwind")
    rebuilt.foreach { case (k, joined) =>
      assert(joined == names(k), s"part $k: join(words) must equal p_name")
    }
    // UNWIND is a generator, not a join: the plan must hold a single
    // Generate over the scan and no exchange before the final sort.
    val plan = RelQueries.p10Unwind(spark, sf).queryExecution
      .executedPlan.toString
    assert(plan.contains("Generate"), plan.take(400))
    // Everything at or below the Generate (scan side) must be local; the
    // only exchange allowed is the final orderBy's range partitioning
    // ABOVE it.
    val fromGenerate = plan.substring(plan.indexOf("Generate"))
    assert(!fromGenerate.contains("Exchange"),
      "generator must run in the scan stage, shuffle-free")
  }

  test("o21 rollup: subtotal algebra — levels 0/1/3, margins sum to the total") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.RelQueries.o21RollupRevenue(spark, sf)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getDouble(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._5).toSet == Set(0L, 1L, 3L))
    val total = rows.filter(_._5 == 3)
    assert(total.length == 1 && total.head._1.isEmpty && total.head._2.isEmpty)
    val nOrders = Tables.orders(spark, sf).count()
    assert(total.head._4 == nOrders, s"grand total ${total.head._4} != $nOrders")
    // each region subtotal (lvl 1) equals the sum of its leaf rows
    rows.filter(_._5 == 1).foreach { case (region, _, rev, n, _) =>
      val leaves = rows.filter(r => r._5 == 0 && r._1 == region)
      assert(leaves.map(_._4).sum == n, s"region $region order count")
      assert(math.abs(leaves.map(_._3).sum - rev) < 1e-6,
        s"region $region revenue subtotal")
    }
    // lvl 3 revenue equals the sum of lvl 1 subtotals
    assert(math.abs(rows.filter(_._5 == 1).map(_._3).sum
      - total.head._3) < 1e-6)
  }

}
