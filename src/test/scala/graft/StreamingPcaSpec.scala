package graft

import graft.pipeline.Pca
import graft.streaming.StreamingPca
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[StreamingPca.Accumulator]] through the real streaming
  * runtime (MemoryStream source, foreachBatch sink) and pins the folded
  * model against the one-pass batch fit — the streaming ≡ batch
  * contract the w15 gate hash-checks in DuckDB.
  */
class StreamingPcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows: Seq[(Long, Seq[Double])] = (0 until 45).map { i =>
    (i.toLong, Seq(math.sin(0.9 * i), math.cos(1.3 * i),
      (i % 5).toDouble / 2.0, 0.4 * math.sin(3.1 * i)))
  }

  test("foreachBatch moment fold refits to the batch model exactly") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Seq[Double])]
    val accum = new StreamingPca.Accumulator()
    val q = src.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: DataFrame, _: Long) => accum.update(b) }
      .start()
    try {
      // three uneven micro-batches, processed as separate triggers
      src.addData(rows.take(10): _*); q.processAllAvailable()
      src.addData(rows.slice(10, 11): _*); q.processAllAvailable()
      src.addData(rows.drop(11): _*); q.processAllAvailable()
    } finally q.stop()
    val mm = accum.model.getOrElse(fail("accumulator absorbed nothing"))
    val full = Pca.fit(rows.toDF("vec_id", "embedding"))
    assert(mm.n == full.n)
    assert(mm.mean.zip(full.mean)
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(mm.eigenvalues.zip(full.eigenvalues)
      .forall { case (a, b) => math.abs(a - b) < 1e-10 })
    assert(math.abs(mm.totalVar - full.totalVar) < 1e-10)
  }

  test("empty micro-batches are absorbed as no-ops") {
    val accum = new StreamingPca.Accumulator()
    accum.update(rows.take(3).toDF("vec_id", "embedding").filter("vec_id < 0"))
    assert(accum.stats.isEmpty)
    accum.update(rows.take(3).toDF("vec_id", "embedding"))
    assert(accum.stats.exists(_.n == 3))
  }
}
