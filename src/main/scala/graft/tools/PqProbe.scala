package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.Similarity
import graft.Tables

/** Ad-hoc calibration probe for the ann_pq_recall floor: measures PQ
  * (ADC-shortlist + exact rerank) recall@10 against the exact Euclidean
  * top-10 per decade, so the floor is set one band under the measured
  * minimum instead of guessed (r11 verdict #6).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/root/repo/benchdata/sf1")
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val exact = Similarity.bruteForceTopKL2(emb, 0L, 10)
      val r = Similarity.recallAtK(exact,
        Similarity.pqTopK(emb, 0L, 10), "pq").head()
      println(s"PROBE $d recall@10=${r.getDouble(2)}")
      val r2 = Similarity.recallAtK(exact,
        Similarity.ivfPqTopK(emb, 0L, 10), "ivfpq").head()
      println(s"PROBE $d ivfpq recall@10=${r2.getDouble(2)}")
      // IVF recall is measured against the COSINE exact top-10 (the
      // metric ivfTopK ranks by), at the gate parameters (8 cells,
      // probe 5) — added r13 to calibrate the per-decade floor at sf1.
      val exactCos = Similarity.bruteForceTopK(emb, 0L, 10)
      val r3 = Similarity.recallAtK(exactCos,
        Similarity.ivfTopK(emb, 0L, 10, nClusters = 8, nProbe = 5),
        "ivf").head()
      println(s"PROBE $d ivf recall@10=${r3.getDouble(2)}")
      graft.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
