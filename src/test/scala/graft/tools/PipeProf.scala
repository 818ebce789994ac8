package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ad-hoc stage-by-stage forensics for the d4 prefix-filter pipeline
  * (`sbt "Test/runMain graft.tools.PipeProf [dir]"`): times each
  * intermediate so a slow run can be attributed to one stage.
  */
object PipeProf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, dir)
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[pipeprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s -> $r")
      r
    }
    val threshold = 0.9
    val sets = docs.select(col("source"), col("doc_id"),
      array_distinct(graft.pipeline.Dedup.words(col("text"))).as("ws")).cache()
    t("sets.count")(sets.count())
    val toks = sets.select(col("source"), col("doc_id"),
      size(col("ws")).as("sz"), explode(col("ws")).as("w"))
    t("toks.count")(toks.count())
    val dfreq = toks.groupBy(col("w")).agg(count(lit(1)).as("df"))
    t("dfreq.count")(dfreq.count())
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("w"))
    val prefix = toks.join(dfreq, "w")
      .withColumn("rank", row_number().over(byRarity))
      .filter(col("rank") <=
        col("sz") - ceil(col("sz") * lit(threshold) - lit(1e-9)) + lit(1))
      .select(col("source"), col("doc_id"), col("w")).cache()
    t("prefix.count")(prefix.count())
    val cand = prefix.select(col("source"), col("doc_id").as("doc_a"), col("w"))
      .join(prefix.select(col("source"), col("doc_id").as("doc_b"), col("w")),
        Seq("source", "w"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct().cache()
    t("cand.count")(cand.count())
    val out = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("ws").as("ws_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("ws").as("ws_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ws_a"), col("ws_b"))))
      .withColumn("uni", size(col("ws_a")) + size(col("ws_b")) - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= threshold)
    t("verify+filter.count")(out.count())
    t("full d4 second pass")(graft.SparkEntry.queries("d4_ngram_jaccard")(spark, dir).count())
    // doc/corpus shape
    val shape = sets.agg(avg(size(col("ws"))), max(size(col("ws"))),
      countDistinct(col("source"))).head()
    println(s"[pipeprof] avg|ws|=${shape.get(0)} max|ws|=${shape.get(1)} nblocks=${shape.get(2)}")
    dfreq.orderBy(desc("df")).limit(8).collect()
      .foreach(r => println(s"[pipeprof] hot token '${r.get(0)}' df=${r.get(1)}"))
    spark.stop()
  }
}
