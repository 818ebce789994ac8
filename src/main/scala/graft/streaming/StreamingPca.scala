package graft.streaming

import graft.pipeline.Pca
import org.apache.spark.sql.DataFrame

/** Streaming PCA maintenance: fold embedding micro-batches into the
  * running sufficient statistics via `foreachBatch`. Because the
  * statistics are exact sums ([[graft.pipeline.Pca.Stats]]), the fold is
  * order-independent and each micro-batch costs one O(batch) moment scan
  * — the model is refittable at any point (driver-side O(d³)) without
  * rescanning history, and the accumulated stats can be persisted
  * between runs with [[graft.pipeline.Pca.saveStats]] (the v7 gate's
  * at-rest artifact) so a restarted stream resumes from the checkpointed
  * moments instead of an empty model.
  */
object StreamingPca {

  /** foreachBatch sink: `update` is the batch body; `model` refits from
    * whatever has been absorbed so far. Thread-safe (Structured
    * Streaming serializes foreachBatch calls per query; the lock also
    * covers ad-hoc readers).
    */
  final class Accumulator(vecCol: String = "embedding")
      extends Serializable {
    @volatile private var acc: Option[Pca.Stats] = None

    def update(batch: DataFrame): Unit =
      if (!batch.isEmpty) {
        val st = Pca.stats(batch, vecCol)
        synchronized { acc = Some(acc.map(_.merge(st)).getOrElse(st)) }
      }

    def stats: Option[Pca.Stats] = acc
    def model: Option[Pca.Model] = acc.map(Pca.fitFromStats)
  }
}
