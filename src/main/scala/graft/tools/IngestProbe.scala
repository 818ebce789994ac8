package graft.tools

import graft.Tables
import graft.pipeline.{Dedup, Pca, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-ingest scale probe (r13 verdict #6): the 100 TB story
  * for the index-at-rest paths is not the decade-probed correctness —
  * it is batch-ingest LATENCY against a growing at-rest corpus. For a
  * FIXED batch size across decades, the batch-assign cost must be
  * (approximately) independent of corpus size:
  *
  *  - d16 `incrementalNearDupFromIndex`: the batch shingles/bands
  *    itself, probes the corpus bucket table, and fetches shingle sets
  *    only for candidate ids. The bucket probe is a join against an
  *    O(corpus) parquet — locally a columnar scan of two thin columns;
  *    at cluster scale the buckets table is stored bucketed by
  *    (band, bucket) so the probe prunes. The probe pins how the LOCAL
  *    plan's constant actually moves with corpus size.
  *  - d49 `incrementalSemanticDedup`: since r14 the posting lists carry
  *    vectors at rest partitioned by sem_cluster and the probe filters
  *    to the batch's probed cluster ids — partition pruning makes the
  *    read ∝ probed-cluster mass (which grows with corpus within a
  *    fixed k — the honest denominator the table shows).
  *  - v7 `loadStats + merge + fitFromStats`: O(d²) artifact read +
  *    O(batch·d²) moment scan + O(d³) driver refit — corpus appears
  *    nowhere; the flattest line of the three by construction.
  *
  * Prints one PROBE line per (gate, decade) with the batch-op median
  * and the per-decade ratio vs the previous decade; index build times
  * are reported separately (they ARE corpus-sized, by design, paid
  * once).
  */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/benchdata/sf1", "/root/repo/benchdata/sf10")
        .filter(d => new java.io.File(d).exists())
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def medMs(body: () => Unit, n: Int = 5): Double = {
      body() // warm (also materializes any lazy index reads)
      val xs = (1 to n).map { _ =>
        val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e6
      }.sorted
      xs(n / 2)
    }

    val results = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.ArrayBuffer[(String, Double)]]()
    def record(gate: String, d: String, ms: Double): Unit = {
      val buf = results.getOrElseUpdate(gate,
        scala.collection.mutable.ArrayBuffer[(String, Double)]())
      val ratio = buf.lastOption.map(p => ms / p._2)
      buf += ((d, ms))
      println(f"PROBE $gate%-14s ${d.split('/').last}%-7s batch_ms=$ms%8.1f" +
        ratio.map(r => f"  step_ratio=$r%.2f").getOrElse(""))
    }

    dirs.foreach { d =>
      val sf = d.split('/').last
      val docs = Tables.documents(spark, d)
      val emb = Tables.embeddings(spark, d)

      // ---- d16: MinHash near-dup index at rest ----
      val docCorpus = docs.filter(col("doc_id") >= 200L)
      val docBatch = graft.CacheRegistry.register(
        docs.filter(col("doc_id") < 200L).localCheckpoint())
      val ndPath = java.nio.file.Files
        .createTempDirectory(s"ingest_nd_$sf").toString
      val tb0 = System.nanoTime()
      Dedup.saveNearDupIndex(docCorpus, ndPath)
      graft.CacheRegistry.releaseAll()
      println(f"PROBE d16_build     $sf%-7s index_ms=${
        (System.nanoTime() - tb0) / 1e6}%9.1f (corpus-sized, paid once)")
      record("d16_ingest", sf, medMs(() => {
        Dedup.incrementalNearDupFromIndex(spark, ndPath, docBatch).count()
        graft.CacheRegistry.releaseAll()
      }))

      // ---- d49: SemDeDup index at rest (cluster-partitioned postings) ----
      val vecCorpus = emb.filter(col("vec_id") >= 100L)
      val vecBatch = graft.CacheRegistry.register(
        emb.filter(col("vec_id") < 100L).localCheckpoint())
      val semPath = java.nio.file.Files
        .createTempDirectory(s"ingest_sem_$sf").toString
      val ts0 = System.nanoTime()
      Similarity.semSaveIndex(vecCorpus, semPath)
      println(f"PROBE d49_build     $sf%-7s index_ms=${
        (System.nanoTime() - ts0) / 1e6}%9.1f (corpus-sized, paid once)")
      record("d49_ingest", sf, medMs(() => {
        Similarity.incrementalSemanticDedup(spark, semPath, vecBatch).count()
        graft.CacheRegistry.releaseAll()
      }))

      // ---- v7: PCA moments at rest ----
      val pcaPath = java.nio.file.Files
        .createTempDirectory(s"ingest_pca_$sf").toString
      val tp0 = System.nanoTime()
      Pca.saveStats(spark, Pca.stats(vecCorpus), pcaPath)
      println(f"PROBE v7_build      $sf%-7s index_ms=${
        (System.nanoTime() - tp0) / 1e6}%9.1f (corpus-sized, paid once)")
      record("v7_ingest", sf, medMs(() => {
        Pca.fitFromStats(
          Pca.loadStats(spark, pcaPath).merge(Pca.stats(vecBatch))): Unit
      }))
      graft.CacheRegistry.releaseAll()
    }

    results.foreach { case (gate, series) =>
      val first = series.head._2
      val line = series.map { case (sf, ms) =>
        f"$sf=${ms}%.0fms(${ms / first}%.2fx)" }.mkString(" ")
      println(s"PROBE SUMMARY $gate $line")
    }
    spark.stop()
  }
}
