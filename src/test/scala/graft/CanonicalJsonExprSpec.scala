package graft

import graft.functions.{CanonicalJsonExpr, JsonCanon}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CanonicalJsonExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("native expression output equals the scala function, nulls pass through") {
    CanonicalJsonExpr.register(spark)
    val in = Seq(
      """{"b": 1, "a": "x"}""",
      """{"z": [3, 1, 2], "a": {"c": true, "b": null}}""",
      null)
    val out = in.toDF("j")
      .select(call_function("canonical_json", col("j")).as("cj"))
      .as[String].collect()
    assert(out(0) == JsonCanon.canonicalize(in(0)))
    assert(out(1) == JsonCanon.canonicalize(in(1)))
    assert(out(2) == null)
  }

  test("plan stays inside whole-stage codegen with no ScalaUDF") {
    CanonicalJsonExpr.register(spark)
    // Parquet-backed input: a local literal would be constant-folded into
    // a LocalTableScan with no codegen stage at all.
    val df = Tables.events(spark, "/root/testdata/sf0.001")
      .select(call_function("canonical_json", col("props")).as("cj"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage.
    assert(plan.contains("*(1) Project [canonical_json"), plan)
    assert(df.head().getString(0).startsWith("""{"k": """))
  }

  test("sql surface resolves the native function") {
    CanonicalJsonExpr.register(spark)
    val r = spark.sql("""SELECT canonical_json('{"b":2, "a":1}') AS cj""")
      .head().getString(0)
    assert(r == """{"a": 1, "b": 2}""")
  }

  test("extensions class injects without error") {
    // getOrCreate reuses the suite session and would ignore withExtensions,
    // so exercise the injection API directly.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
  }

  test("extensions-built session resolves the whole native family via SQL") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // Same SparkContext, new SparkSession. The config-string form
      // (spark.sql.extensions=graft.GraftExtensions) is read from the
      // SparkContext's conf at context creation, which the shared suite
      // context predates — withExtensions exercises the same injection
      // path at session construction.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne prev)
      val r = s2.sql(
        """SELECT canonical_json('{"b":2, "a":1}') AS cj,
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
          |  vec_dot_centered(array(1.0D, 2.0D), array(0.5D, 0.5D),
          |                   array(1.0D, 1.0D)) AS vdc,
          |  word_shingles(array('a', 'b', 'c'), 2) AS ws,
          |  minhash_sig(array('ab', 'bc'), 4) AS mh,
          |  simhash64(array('hello', 'world')) AS sh""".stripMargin).head()
      assert(r.getString(0) == """{"a": 1, "b": 2}""")
      assert(r.getDouble(1) == 11.0)
      assert(math.abs(r.getDouble(2) - 2.0) < 1e-9)
      assert(r.getSeq[String](3) == Seq("a b", "b c"))
      assert(r.getSeq[Long](4).length == 4)
      r.getLong(5) // type check: simhash64 yields a bigint
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("non-literal shingle width raises a nameable analysis error") {
    import org.apache.spark.sql.{AnalysisException, SparkSession}
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      // Pre-fix this died at builder time with an opaque
      // UnsupportedOperationException (eval on unresolved); now it's a
      // named NON_FOLDABLE_ARGUMENT analysis error.
      val e = intercept[AnalysisException] {
        s2.sql(
          "SELECT word_shingles(array('a','b'), cast(rand() * 3 AS int))")
          .head()
      }
      assert(e.getMessage.contains("foldable"), e.getMessage)
      val e2 = intercept[AnalysisException] {
        s2.sql("SELECT minhash_sig(array('a'), null)").head()
      }
      assert(e2.getMessage.contains("foldable"), e2.getMessage)
      // Foldable constant EXPRESSIONS (not bare literals) must still
      // work — they did under the pre-r8 eval path: `1+2`, a cast of a
      // string literal. Only genuinely non-constant args are rejected.
      assert(s2.sql("SELECT size(word_shingles(array('a','b','c'), 1+2))")
        .head().getInt(0) == 1)
      assert(s2.sql(
        "SELECT size(minhash_sig(array('a'), cast('8' as int)))")
        .head().getInt(0) == 8)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
