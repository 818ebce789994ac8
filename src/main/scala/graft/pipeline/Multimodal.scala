package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the *decode step is a
  * clearly-marked deterministic stub* ([[fakeDecodeFeatures]]) — what is
  * real and tested is the Spark-side plumbing that matters at 100 TB:
  * binary column schemas, per-partition batch processing (the Scala analog
  * of `mapInPandas`: one buffer-reusing pass per partition, not one call
  * per row), feature-vector schema (`ARRAY<FLOAT>` ready for
  * [[Similarity]]), and expression-level frame sampling.
  *
  * Partitioning note: media blobs dominate row size, so upstream layout
  * should write them to their own parquet files with a small
  * `maxPartitionBytes` and co-partition by the join key; everything here
  * is scan-local (no shuffle).
  */
object Multimodal {

  /** Typed media table derived from documents: payload bytes + metadata.
    * (In a real pipeline this is the raw image/audio table; here the bytes
    * are the UTF-8 text so every stage is deterministic and oracle-able.)
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      (lit(64) + pmod(col("doc_id"), lit(64))).cast("int").as("width"),
      (lit(48) + pmod(col("doc_id"), lit(48))).cast("int").as("height"),
      lit("fake/raw").as("fmt"))

  private val featSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(FloatType, containsNull = false)),
    // Exact integer per-block byte sums alongside the float means: float
    // columns hash differently across engines, so the correctness gate
    // verifies the exact sums (the means are sums / block length).
    StructField("block_sums", ArrayType(LongType, containsNull = false))))

  /** STUB decode + feature extraction.
    *
    * A real implementation would decode `media` (JPEG/WAV/...) and run a
    * feature extractor; neither codec exists in this container, so the
    * "decode" is a deterministic fake: the feature vector is the mean byte
    * value of `numFeatures` equal blocks of the payload. The
    * per-partition batch loop, schema, and downstream compatibility are
    * the real deliverables.
    */
  def fakeDecodeFeatures(media: DataFrame, numFeatures: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(featSchema)
    media.select(col("doc_id"), col("media"))
      .mapPartitions { rows =>
        // One reusable buffer per partition — the mapInPandas batch shape.
        val feats = new Array[Float](numFeatures)
        val sums = new Array[Long](numFeatures)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = bytes.length
          java.util.Arrays.fill(feats, 0f)
          java.util.Arrays.fill(sums, 0L)
          var j = 0
          while (j < numFeatures) {
            val lo = j * n / numFeatures
            val hi = math.max(lo + 1, (j + 1) * n / numFeatures)
            var s = 0L
            var i = lo
            while (i < hi) { s += bytes(i) & 0xff; i += 1 }
            sums(j) = s
            feats(j) = s.toFloat / (hi - lo)
            j += 1
          }
          Row(id, n, feats.clone().toSeq, sums.clone().toSeq)
        }
      }(enc)
  }

  /** Frame sampling analog: fingerprint every `frameBytes`-sized chunk of
    * the payload (expression-only — xxhash64 over substrings; for video
    * this is the every-Nth-frame sample).
    */
  def frameSample(media: Column, frameBytes: Int = 64): Column =
    transform(
      sequence(lit(0), ((length(media) - lit(1)) / lit(frameBytes)).cast("int")),
      i => xxhash64(media.substr((i * frameBytes + 1).cast("int"), lit(frameBytes))))
}
