package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the resolved-scan memo's contract (Tables.scala): repeated
  * resolutions reuse the analyzed plan (the warm-query replanning tax is
  * paid once), sessions never share plans, and `invalidate` drops pinned
  * file listings after an in-place directory rewrite.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("repeated resolution returns the memoized DataFrame instance") {
    val a = Tables(spark, sf, "nation")
    val b = Tables(spark, sf, "nation")
    assert(a eq b, "second resolution should hit the memo")
    assert(a.count() == b.count())
  }

  test("memo is scoped per session — a new session gets its own plan") {
    val s2 = spark.newSession()
    val a = Tables(spark, sf, "region")
    val b = Tables(s2, sf, "region")
    assert(!(a eq b), "sessions must not share memoized DataFrames")
    assert(b.sparkSession eq s2)
  }

  test("invalidate drops entries under the dir; re-resolve sees new files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tables_memo").toString
    Seq((1, "x")).toDF("id", "v").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    val first = Tables(spark, dir, "t")
    assert(first.count() == 1)
    // In-place rewrite with MORE rows: a pinned listing would miss them
    // (or fail on vanished files).
    Seq((1, "x"), (2, "y"), (3, "z")).toDF("id", "v").write.mode("overwrite")
      .parquet(s"$dir/t.parquet")
    Tables.invalidate(dir)
    val second = Tables(spark, dir, "t")
    assert(!(first eq second), "invalidate must drop the stale entry")
    assert(second.count() == 3)
  }
}
