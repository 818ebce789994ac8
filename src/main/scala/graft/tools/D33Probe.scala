package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
import graft.Tables

/** Ad-hoc calibration probe for the d33 SemDeDup recall floor: measures
  * cluster-blocking recall (intra-cluster ≥0.4-cos pairs over the
  * exhaustive global pair set) per nClusters and per decade, so the gate
  * floor is set one band under the measured minimum instead of guessed.
  */
object D33Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    for (d <- dirs; k <- Seq(6, 8); p <- Seq(2, 3, 4)) {
      val emb = Tables.embeddings(spark, d)
      val exact = Similarity.cosinePairsExact(
        emb.select(lit(0).as("blk"), col("vec_id"), col("embedding")),
        "blk", 0.4)
      val r = Similarity.pairRecall(exact,
        Similarity.semanticDedupPairs(emb, nClusters = k, probes = p),
        "x").head()
      println(s"PROBE $d k=$k p=$p n_exact=${r.getInt(1)} recall=${r.getDouble(2)}")
      graft.CacheRegistry.releaseAll()
    }
    // d49 (stored-index incremental probe) recall per decade — the
    // batch×corpus direction at the gate parameters, for the
    // d49RecallFloor calibration (r13).
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val corpus = emb.filter(col("vec_id") >= 100L)
      val batch = emb.filter(col("vec_id") < 100L)
      val path = java.nio.file.Files.createTempDirectory("d49probe").toString
      Similarity.semSaveIndex(corpus, path)
      val exact = Similarity.crossCosinePairsExact(batch, corpus, 0.4)
      val approx = Similarity.incrementalSemanticDedup(spark, path, batch)
        .select(col("batch_doc").as("vec_a"), col("corpus_doc").as("vec_b"))
      val r = Similarity.pairRecall(exact, approx, "d49").head()
      println(s"PROBE d49 $d n_exact=${r.getInt(1)} recall=${r.getDouble(2)}")
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
