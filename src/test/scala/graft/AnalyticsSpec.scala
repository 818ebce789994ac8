package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the event-analytics family (the oracle
  * hash-compare is the strong gate; these pin the semantics that make
  * each shape correct by construction).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("funnel steps are strictly ordered and monotonically attriting") {
    val rows = AnalyticsQueries.f1Funnel(spark, sf).collect()
    rows.foreach { r =>
      val t1 = r.getLong(1)
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      t2.foreach(v => assert(v > t1, "step 2 must follow step 1"))
      t3.foreach { v =>
        assert(t2.nonEmpty, "step 3 requires step 2")
        assert(v > t2.get, "step 3 must follow step 2")
      }
    }
    val n1 = rows.length
    val n2 = rows.count(!_.isNullAt(2))
    val n3 = rows.count(!_.isNullAt(3))
    assert(n1 >= n2 && n2 >= n3 && n3 > 0 && n2 < n1,
      s"funnel must attrit: $n1 -> $n2 -> $n3")
  }

  test("gap-fill covers every user's span contiguously; zeros add nothing") {
    val rows = AnalyticsQueries.o7GapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { g =>
      val hours = g.map(_._2).sorted
      assert(hours.length == (hours.last - hours.head) / 3600000L + 1,
        "hour axis must be contiguous")
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000L })
    }
    val total = rows.map(_._3).sum
    assert(total == Tables.events(spark, sf).count(),
      "zero-filling must not change the event total")
    assert(rows.exists(_._3 == 0L), "fixture must contain real gaps")
  }

  test("cohort retention: offset-0 cell equals the cohort size") {
    val rows = AnalyticsQueries.c1CohortRetention(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val cohortSizes = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("day")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.filter(_._2 == 0).foreach { case (day, _, n) =>
      assert(n == cohortSizes(day), s"offset-0 of $day must equal cohort size")
    }
    assert(rows.forall(_._2 >= 0), "no activity before the cohort day")
  }

  test("a16 moments agree with Spark's native skewness/kurtosis") {
    // Independent pin: the exact-power-sum derivation must reproduce the
    // engine's own (population) moment aggregates to float precision.
    val got = AnalyticsQueries.a16Moments(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(4), r.getDouble(5))).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("s"),
        kurtosis(col("l_quantity")).as("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(got.keySet == native.keySet)
    got.foreach { case (flag, (sk, ku)) =>
      assert(math.abs(sk - native(flag)._1) < 1e-8, s"skew $flag")
      assert(math.abs(ku - native(flag)._2) < 1e-8, s"kurt $flag")
    }
  }

  test("a17 regression agrees with Spark's native regr_* aggregates") {
    val got = AnalyticsQueries.a17Regr(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val native = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("s"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("i"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    got.foreach { case (flag, (sl, in, r2)) =>
      val (ns, ni, nr) = native(flag)
      assert(math.abs(sl - ns) / math.abs(ns) < 1e-6, s"slope $flag")
      assert(math.abs(in - ni) / math.abs(ni) < 1e-6, s"intercept $flag")
      assert(math.abs(r2 - nr) < 1e-6, s"r2 $flag")
    }
  }

  test("a18 mode picks the max count with the smallest-key tie-break") {
    val cnts = Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"), col("c_nationkey")).count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val want = cnts.groupBy(_._1).map { case (seg, rows) =>
      val mx = rows.map(_._3).max
      seg -> rows.filter(_._3 == mx).map(_._2).min
    }
    val got = AnalyticsQueries.a18Mode(spark, sf).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == want)
  }

  test("o8 percent_rank/cume_dist are bounded and price-monotone") {
    val rows = AnalyticsQueries.o8PercentRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    assert(rows.forall(r => r._4 > 0.0 && r._4 <= 1.0))
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._4).max == 1.0, "cume_dist must top out at 1")
      assert(g.count(_._3 == 0.0) >= 1, "cheapest row has percent_rank 0")
    }
  }

  test("o9 trailing window matches a brute-force per-event recount") {
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val got = AnalyticsQueries.o9TrailingWindow(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val byUser = events.groupBy(_._2)
    events.take(200).foreach { case (id, u, t, _) =>
      val want = byUser(u).count(e => e._3 >= t - 3600000000L && e._3 <= t)
      assert(got(id) == want, s"event $id trailing count")
    }
  }

  test("j17 full outer realizes both null directions with zero fills") {
    val rows = AnalyticsQueries.j17FullOuter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.exists(r => r._2 == 0L && r._3 > 0L),
      "low-only customer must appear")
    assert(rows.exists(r => r._2 > 0L && r._3 == 0L),
      "urgent-only customer must appear")
    assert(rows.map(_._1).distinct.length == rows.length)
    assert(rows.forall(r => r._2 > 0L || r._3 > 0L),
      "a full-outer row must come from at least one side")
  }

  test("o10 frame bounds: lv is the true partition-last row, nv the third") {
    // The default-frame trap: last_value over ORDER BY without an
    // explicit frame returns the CURRENT row. Pin that our explicit
    // full frame returns the genuine partition extremes.
    val rows = AnalyticsQueries.o10FrameBounds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val prices = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    prices.groupBy(_._2).foreach { case (prio, g) =>
      val sorted = g.sortBy(_._1)
      val inGate = rows.filter(_._2 == prio)
      assert(inGate.forall(_._3 == sorted.head._3), s"fv $prio")
      assert(inGate.forall(_._4 == sorted.last._3), s"lv $prio")
      val nv = if (sorted.length >= 3) Some(sorted(2)._3) else None
      assert(inGate.forall(_._5 == nv), s"nv $prio")
    }
  }

  test("h2 profile: stats match direct recomputation") {
    val byCol = AnalyticsQueries.h2Profile(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val o = Tables.orders(spark, sf)
    val n = o.count()
    assert(byCol("o_totalprice") ==
      ((n, 0L, o.select(col("o_totalprice")).distinct().count())))
    assert(byCol("o_orderstatus")._3 ==
      o.select(col("o_orderstatus")).distinct().count())
    assert(byCol("o_orderdate")._1 == n)
  }

  test("m11 scd2: per-user versions chain contiguously, one current") {
    val rows = AnalyticsQueries.m11Scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (u, vs) =>
      assert(vs.count(_._4) == 1, s"user $u must have exactly one current")
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2),
            s"user $u: valid_to must equal the next valid_from")
        case _ =>
      }
      assert(sorted.last._3.isEmpty, "only the last version is open-ended")
    }
  }

  test("o11 ewma equals the driver-side left fold of the ordered stream") {
    val got = AnalyticsQueries.o11Ewma(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    events.groupBy(_._1).foreach { case (u, es) =>
      val vals = es.sortBy(e => (e._2, e._3)).map(_._4)
      val want = vals.tail.foldLeft(vals.head)((acc, x) => 0.3 * x + 0.7 * acc)
      val (n, ewma) = got(u)
      assert(n == vals.length, s"user $u event count")
      // Identical double ops in identical order: bit-equal, not approx.
      assert(ewma == want, s"user $u: got $ewma want $want")
    }
    assert(got.size == events.map(_._1).distinct.length)
  }

  test("o12 interpolation: observed hours untouched, gaps on the line") {
    val rows = AnalyticsQueries.o12Interp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.forall(r => !r._3.isNaN), "no NaN leaks")
    // Observed hours must carry the exact decimal hourly sum.
    val observed = Tables.events(spark, sf)
      .groupBy(col("user_id"),
        unix_millis(date_trunc("hour", col("ts"))).as("h_ms"))
      .agg(sum(col("value").cast(
        org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)))
        .cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val byKey = rows.map(r => (r._1, r._2) -> r._3).toMap
    observed.foreach { case (k, v) =>
      assert(byKey(k) == v, s"observed hour $k must be exact")
    }
    // Every gap hour sits on the straight line between its neighbors.
    rows.groupBy(_._1).values.foreach { g =>
      val hs = g.sortBy(_._2)
      val obsIdx = hs.zipWithIndex.filter(p => observed.contains((p._1._1, p._1._2)))
      obsIdx.sliding(2).foreach {
        case Array((a, ia), (b, ib)) if ib - ia > 1 =>
          ((ia + 1) until ib).foreach { i =>
            val (_, h, v) = hs(i)
            val want = a._3 + (b._3 - a._3) *
              ((h - a._2) / (b._2 - a._2).toDouble)
            assert(v == want, s"gap hour $h must interpolate linearly")
          }
        case _ =>
      }
    }
  }

  test("o13 sliding distinct count matches the brute-force frame scan") {
    val got = AnalyticsQueries.o13WindowDistinct(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")),
        col("user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    events.groupBy(_._2).values.foreach { g =>
      g.foreach { case (id, _, t, _) =>
        // RANGE frames include the lower bound (>=, not >).
        val want = g.filter(e => e._3 >= t - 3600000000L && e._3 <= t)
          .map(_._4).distinct.length.toLong
        assert(got(id) == want, s"event $id trailing-hour distinct")
      }
    }
    assert(got.size == events.length)
  }

  test("a22 welch t matches the driver-side recompute") {
    val r = AnalyticsQueries.a22WelchT(spark, sf).collect().head
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val vals = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"))
      .collect().map(x => x.getString(0) -> x.getDouble(1))
    def stats(t: String) = {
      val v = vals.filter(_._1 == t).map(_._2)
      val m = v.sum / v.length
      (v.length.toLong, m,
        v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
    }
    val (cn, cm, cv) = stats("click")
    val (pn, pm, pv) = stats("purchase")
    assert(n1 == cn && n2 == pn)
    val t = (cm - pm) / math.sqrt(cv / cn + pv / pn)
    // Different summation order on the driver: approx, not bit-equal.
    assert(math.abs(r.getDouble(3) - t) < 1e-9 * math.max(1.0, math.abs(t)),
      s"got ${r.getDouble(3)} want $t")
  }

  test("a23 chi-squared matches the driver-side contingency recompute") {
    val r = AnalyticsQueries.a23ChiSquared(spark, sf).collect().head
    val cells = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"))
      .collect().map(x => (x.getString(0), x.getDouble(1) > 50))
    def n(t: String, hi: Boolean) = cells.count(c => c._1 == t && c._2 == hi).toLong
    val (a, b, c2, d2) =
      (n("click", true), n("click", false), n("purchase", true), n("purchase", false))
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((a, b, c2, d2)))
    val det = a.toDouble * d2 - b.toDouble * c2
    val want = (a + b + c2 + d2).toDouble * det * det /
      ((a + b) * (c2 + d2).toDouble * (a + c2) * (b + d2))
    assert(r.getDouble(4) == want, s"got ${r.getDouble(4)} want $want")
  }

  test("skyline tie semantics: planted duplicates, same-x, equal-y-dominance") {
    import spark.implicits._
    // (3,9) twice: equal points never dominate each other -> n=2 survivor.
    // (3,5): dominated within its own x group.
    // (5,9) ABSENT but (5,8) present: y=9 at x=3 survives only because
    //   nothing at larger x reaches 9; (4,8) is dominated by (5,8)'s
    //   equal y at strictly larger x.
    // (7,2): max-x always survives.
    val pts = Seq((3L, 9.0), (3L, 9.0), (3L, 5.0), (4L, 8.0),
      (5L, 8.0), (6L, 1.0), (7L, 2.0)).toDF("x", "y")
    val got = AnalyticsQueries.skyline(pts).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == Set((3L, 9.0, 2L), (5L, 8.0, 1L), (7L, 2.0, 1L)))
    // Degenerate inputs: single point; all points identical.
    assert(AnalyticsQueries.skyline(Seq((1L, 1.0)).toDF("x", "y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq == Seq((1L, 1.0, 1L)))
    assert(AnalyticsQueries.skyline(
        Seq.fill(4)((2L, 3.0)).toDF("x", "y"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq == Seq((2L, 3.0, 4L)))
  }

  test("a19 skyline matches the all-pairs dominance check") {
    val pts = Tables.lineitem(spark, sf)
      .select(floor(col("l_quantity")).cast("long"), col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val want = pts.groupBy(identity).map { case ((x, y), g) => (x, y, g.length.toLong) }
      .filter { case (x, y, _) =>
        !pts.exists { case (qx, qy) =>
          qx >= x && qy >= y && (qx > x || qy > y)
        }
      }.toSet
    val got = AnalyticsQueries.a19Skyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
    // The frontier is strictly monotone: x ascending implies y descending.
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 > b._2,
        "larger x on the frontier must trade away y")
      case _ =>
    }
  }

  test("frequent pairs: apriori prune is lossless and support counts baskets once") {
    import graft.pipeline.Itemsets
    import spark.implicits._
    val baskets = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // duplicate item in one basket
      (2L, "a"), (2L, "b"), (2L, "c"),
      (3L, "a"), (3L, "b"),
      (4L, "c"), (4L, "d")) // d is infrequent -> pruned
      .toDF("basket", "item")
    val got = Itemsets.frequentPairs(baskets, "basket", "item", 2L)
      .as[(String, String, Long)].collect().toSet
    // (a,b) in baskets 1,2,3 -> 3; (a,c)/(b,c) once; (c,d) once.
    assert(got == Set(("a", "b", 3L)))
    // minSupport 1 keeps everything, still deduped per basket.
    val all = Itemsets.frequentPairs(baskets, "basket", "item", 1L)
      .as[(String, String, Long)].collect().toSet
    assert(all == Set(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L),
      ("c", "d", 1L)))
  }

  test("MAD outliers: planted spike flagged, scores exceed the cutoff, robust to the spike") {
    val rows = AnalyticsQueries.d28MadOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(3)) > 3.5))
    // Robustness: the flagged rows' values sit far from their type median.
    val med = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - med(r.getString(1))) > 10.0,
        "a flagged outlier must be far from the median")
    }
  }

  test("subtree rollup: root totals and per-order leaf counts are exact") {
    val got = graft.queries.GraphQueries.r6SubtreeRollup(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sf)
    val totalLines = li.count()
    // Regions partition the forest: their subtree counts sum to all lines.
    assert(got.filter(_._1.startsWith("R")).values.sum == totalLines)
    // Every order's subtree count is exactly its lineitem count.
    val perOrder = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => s"O${r.getLong(0)}" -> r.getLong(1)).toMap
    perOrder.foreach { case (o, n) =>
      assert(got(o) == n, s"$o subtree count")
    }
    // Tree invariant: a nation's count is the sum of its customers'.
    val custByNation = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"))
      .collect().map(r => r.getAs[Number](0).longValue ->
        r.getAs[Number](1).longValue)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    custByNation.foreach { case (nk, custs) =>
      val want = custs.map(c => got.getOrElse(s"C$c", 0L)).sum
      assert(got.getOrElse(s"N$nk", 0L) == want, s"N$nk != sum of customers")
    }
  }

  test("cumulative distinct: monotone per type, final value equals the exact distinct") {
    val e = Tables.events(spark, sf)
    val meta = e.select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val rows = AnalyticsQueries.o15CumDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val grouped = rows.groupBy { case (id, _) => meta(id)._1 }
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    grouped.foreach { case (t, g) =>
      // Monotone in EVENT-TIME order (the window's order), not id order.
      val seq = g.sortBy { case (id, _) => (meta(id)._2, id) }.map(_._2)
      assert(seq.zip(seq.tail).forall { case (a, b) => b >= a },
        s"$t cumulative distinct must be monotone")
      assert(seq.max == exact(t), s"$t final value must be the exact distinct")
    }
  }

  test("sequence pattern: every match is a true consecutive click-click-purchase run") {
    val rows = AnalyticsQueries.o16SeqPattern(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // Driver truth: rebuild each user's ordered stream and scan triples.
    val streams = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._4, e._2)).toIndexedSeq).toMap
    val want = streams.flatMap { case (u, es) =>
      es.sliding(3).collect {
        case Seq(a, b, c)
          if a._3 == "click" && b._3 == "click" && c._3 == "purchase" =>
          (u, a._2, c._2, c._4 - a._4)
      }
    }.toSet
    assert(rows.toSet == want)
  }

  test("jackknife SE: positive, and tracks the classical SE on homogeneous blocks") {
    val r = AnalyticsQueries.a28Jackknife(spark, sf).collect().head
    val (n, mean, se) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n > 0 && se > 0)
    val li = Tables.lineitem(spark, sf)
    val stats = li.agg(avg(col("l_quantity")).as("m"),
      stddev(col("l_quantity")).as("sd")).collect().head
    assert(math.abs(mean - stats.getDouble(0)) < 1e-9)
    val classical = stats.getDouble(1) / math.sqrt(n.toDouble)
    // Hash blocks of an i.i.d.-ish column: jackknife lands near s/sqrt(n).
    assert(se > classical * 0.5 && se < classical * 2.0,
      s"jk_se $se vs classical $classical")
  }

  test("mutual information is non-negative and bounded by min marginal entropy") {
    val r = AnalyticsQueries.a24MutualInfo(spark, sf).collect().head
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val mi = r.getDouble(4)
    assert(mi >= -1e-12, s"MI must be non-negative, got $mi")
    val n = (a + b + c + d).toDouble
    def h(p: Double) =
      if (p <= 0 || p >= 1) 0.0 else -p * math.log(p) - (1 - p) * math.log(1 - p)
    val bound = math.min(h((a + b) / n), h((a + c) / n))
    assert(mi <= bound + 1e-12, s"MI $mi exceeds marginal entropy bound $bound")
    // Independent reference: direct plug-in MI from the four cells.
    def t(nij: Long, row: Long, colm: Long) =
      if (nij == 0) 0.0 else (nij / n) * math.log(nij * n / (row.toDouble * colm))
    val want = t(a, a + b, a + c) + t(b, a + b, b + d) +
      t(c, c + d, a + c) + t(d, c + d, b + d)
    assert(math.abs(mi - want) < 1e-12)
  }

  test("transition matrix conserves flow and rows sum to probability one") {
    val rows = AnalyticsQueries.o14Transitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // Per-source probabilities sum to 1.
    rows.groupBy(_._1).foreach { case (src, g) =>
      val p = g.map(_._4).sum
      assert(math.abs(p - 1.0) < 1e-9, s"$src transition probs sum to $p")
    }
    // Total transitions = total events - one per user with >=1 event
    // (each user's last event has no successor).
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    assert(rows.map(_._3).sum == nEvents - nUsers)
  }

  test("constraint audit: counters match independent recomputation") {
    val rows = AnalyticsQueries.h3Constraints(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 7, "one row per rule")
    assert(rows.map(_._1).sorted.sameElements(rows.map(_._1)),
      "rules emitted in sorted order")
    assert(rows.forall { case (_, checked, v) => checked > 0 && v >= 0 &&
      v <= checked })
    val byRule = rows.map(r => r._1 -> r).toMap
    val ev = Tables.events(spark, sf)
    assert(byRule("ev_value_in_0_100")._3 ==
      ev.filter(col("value") < 0 || col("value") > 100).count(),
      "range-rule violations must match a direct filter count")
    assert(byRule("ev_value_in_0_100")._3 > 0,
      "fixture must make the range rule non-vacuous")
    val orphans = ev.join(Tables.customer(spark, sf)
        .select(col("c_custkey").as("user_id")), Seq("user_id"),
        "left_anti").count()
    assert(byRule("ev_user_fk_customer")._3 == orphans,
      "FK violations must equal the anti-join count")
    assert(byRule("ev_event_id_unique")._3 ==
      ev.count() - ev.select("event_id").distinct().count())
  }

  test("entropy decomposition: identity with a24 MI and the chain bounds") {
    val r = AnalyticsQueries.a29Entropy(spark, sf).head()
    val (hx, hxy, mi) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    assert(hx >= 0 && hx <= math.log(2.0) + 1e-12,
      "binary-X entropy bounded by ln 2")
    assert(hxy >= -1e-12 && hxy <= hx + 1e-12,
      "conditioning cannot increase entropy")
    assert(math.abs(mi - (hx - hxy)) < 1e-12)
    val miA24 = AnalyticsQueries.a24MutualInfo(spark, sf)
      .select(col("mi")).head().getDouble(0)
    assert(math.abs(mi - miA24) < 1e-9,
      s"H(X)-H(X|Y)=$mi must equal a24's direct MI $miA24")
  }

  test("KS statistic matches a driver-side ECDF sweep") {
    val r = AnalyticsQueries.a30Ks(spark, sf).head()
    val (n1, n2, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(d >= 0 && d <= 1)
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("event_type", "value").collect()
      .map(row => (row.getString(0), row.getDouble(1)))
    val s1 = ev.filter(_._1 == "click").map(_._2).sorted
    val s2 = ev.filter(_._1 == "purchase").map(_._2).sorted
    assert(n1 == s1.length && n2 == s2.length)
    val want = (s1 ++ s2).distinct.map { v =>
      math.abs(s1.count(_ <= v).toDouble / s1.length -
        s2.count(_ <= v).toDouble / s2.length)
    }.max
    assert(math.abs(d - want) < 1e-12, s"KS D $d != brute-force $want")
  }

  test("rolling median matches a brute-force trailing-frame recomputation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("long").as("tss"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(t => (t._2, t._3))
      s.indices.map { i =>
        val frame = s.slice(math.max(0, i - 9), i + 1).map(_._4).sorted
        val n = frame.length
        val med = (frame((n + 1) / 2 - 1) + frame(n / 2)) / 2
        s(i)._3 -> BigDecimal(med).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    val got = AnalyticsQueries.o17RollingMedian(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == expect.size)
    got.foreach { case (id, m) =>
      assert(math.abs(m - expect(id)) < 1e-9,
        s"event $id: rolling median $m != ${expect(id)}")
    }
  }

  test("psi drift: identical source reads 0, shifted source reads large, order-of-magnitude sane") {
    import spark.implicits._
    // src0 and srcSame share the exact length multiset -> identical bin
    // fractions -> every PSI term is 0. srcShift sits entirely in the
    // top bin -> PSI far above the 0.25 'shifted' convention.
    val lens = (1 to 100).map(_ * 10L)
    val docs = (lens.map(("src0", _)) ++ lens.map(("srcSame", _)) ++
        lens.map(l => ("srcShift", l + 100000L)))
      .toDF("source", "n_chars")
    val got = AnalyticsQueries.psiDrift(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("src0") == 0.0 && got("srcSame") == 0.0, s"got: $got")
    assert(got("srcShift") > 0.25, s"got: $got")
  }
}
