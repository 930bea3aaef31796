package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: opaque
  * binary payloads + typed metadata, batch decode / feature extraction /
  * frame sampling.
  *
  * The image/audio codecs are NOT in this container, so the decode step
  * is a clearly-marked deterministic STUB — but the Spark-side plumbing
  * is real: binary columns flow through parquet-style schemas, decode
  * runs batched per partition (the Scala analog of mapInPandas batch
  * shape), and everything stays distributed (no collect).
  */
object Multimodal {

  case class Blob(id: Long, payload: Array[Byte], format: String)
  case class Features(id: Long, width: Int, height: Int, channels: Int,
                      n_bytes: Int, feature: Array[Float])

  /** Synthesize a binary "media" column from the documents table —
    * stands in for an image/audio payload column at 100 TB. */
  def synthesizeBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("id"),
      col("text").cast("binary").as("payload"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpg").otherwise("wav").as("format"))
      .as[Blob]
  }

  /** Batched decode + feature extraction. Batches of `batchSize` rows are
    * materialized per partition — the exact shape a vectorized
    * (Arrow/Pandas) UDF would see — then "decoded".
    *
    * STUB: a real implementation calls the codec here (e.g. libjpeg /
    * ffmpeg per batch). The fake is deterministic in the payload bytes so
    * tests and oracles are stable.
    */
  def decodeFeatures(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[Features] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // === STUB DECODE (deterministic fake; replace with codec call) ===
        batch.iterator.map { b =>
          val n = b.payload.length
          val hist = new Array[Float](8)
          var i = 0
          while (i < n) { hist((b.payload(i) & 0xff) >> 5) += 1f; i += 1 }
          if (n > 0) { var j = 0; while (j < 8) { hist(j) /= n; j += 1 } }
          Features(b.id, width = 16 + (n % 1024), height = 16 + ((n / 7) % 768),
            channels = if (b.format == "wav") 1 else 3, n_bytes = n, feature = hist)
        }
      }
    }
  }

  /** Frame sampling for "video" payloads: every strideth 16-byte slice as
    * a frame — pure expression pipeline (codegen'd, no UDF). */
  def sampleFrames(blobs: DataFrame, stride: Int = 4,
                   frameBytes: Int = 16): DataFrame =
    blobs.select(col("id"),
      transform(
        sequence(lit(0), greatest(
          (length(col("payload")) / (frameBytes * stride)).cast("int") - 1, lit(0))),
        i => substring(col("payload"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes)))
        .as("frames"))
      .withColumn("n_frames", size(col("frames")))
}
