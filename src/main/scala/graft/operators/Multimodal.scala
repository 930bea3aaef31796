package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: opaque
  * binary payloads + typed metadata, batch decode / feature extraction /
  * frame sampling.
  *
  * The decode step parses REAL container headers (PNG IHDR, BMP
  * BITMAPINFOHEADER, GIF logical screen descriptor, JPEG SOFn, RIFF/WAVE
  * fmt) for dimensions/channels — the same bytes `file(1)` or an
  * imagesize library reads — in pure JVM. Only the pixel/sample decode
  * itself is a clearly-marked STUB (no codec libraries in this
  * container); the Spark-side plumbing is real: binary columns flow
  * through parquet-style schemas, decode runs batched per partition (the
  * Scala analog of mapInPandas batch shape), and everything stays
  * distributed (no collect).
  */
object Multimodal {

  case class Blob(id: Long, payload: Array[Byte], format: String)
  case class Features(id: Long, width: Int, height: Int, channels: Int,
                      n_bytes: Int, feature: Array[Float])

  /** Minimal real container headers around a body. Deterministic in
    * (id, body) so fixtures are stable. */
  object Headers {

    def png(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(33 + body.length)
      out.put(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      out.putInt(13).put("IHDR".getBytes) // IHDR length + tag
      out.putInt(w).putInt(h)
      out.put(8.toByte).put(2.toByte) // bit depth 8, color type 2 (RGB)
      out.put(0.toByte).put(0.toByte).put(0.toByte) // compress/filter/interlace
      out.putInt(0) // CRC (unchecked by header readers)
      out.put(body)
      out.array()
    }

    def jpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
      // SOI(2) + APP0(2 marker + 16 content) + SOF0(2 marker + 8 content)
      val out = java.nio.ByteBuffer.allocate(30 + body.length)
      out.put(0xff.toByte).put(0xd8.toByte) // SOI
      out.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
      out.put("JFIF".getBytes).put(new Array[Byte](10))
      out.put(0xff.toByte).put(0xc0.toByte).putShort(8.toShort) // SOF0, len 8
      out.put(8.toByte).putShort(h.toShort).putShort(w.toShort) // precision,h,w
      out.put(3.toByte) // components
      out.put(body)
      out.array()
    }

    def wav(channels: Int, sampleRate: Int, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(44 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes).putInt(36 + body.length).put("WAVE".getBytes)
      out.put("fmt ".getBytes).putInt(16)
      out.putShort(1) // PCM
      out.putShort(channels.toShort).putInt(sampleRate)
      out.putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      out.putShort(16) // bits per sample
      out.put("data".getBytes).putInt(body.length)
      out.put(body)
      out.array()
    }
  }

  /** Header sniffing: (width, height, channels) from the container bytes.
    * Pure JVM parsers for the formats a 100 TB media column actually
    * carries; None for unrecognized payloads. */
  def parseHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    val n = b.length
    if (n >= 33 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      val channels = u8(25) match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 3
      }
      Some((be32(16), be32(20), channels))
    } else if (n >= 30 && b(0) == 'B' && b(1) == 'M') {
      Some((le32(18), le32(22), math.max(1, le16(28) / 8)))
    } else if (n >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      Some((le16(6), le16(8), 3))
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk markers to the first SOFn frame header
      var i = 2
      while (i + 9 < n && u8(i) == 0xff) {
        val marker = u8(i + 1)
        val len = be16(i + 2)
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some((be16(i + 7), be16(i + 5), u8(i + 9)))
        i += 2 + len
      }
      None
    } else if (n >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      Some((le32(24), 0, le16(22))) // (sample rate, -, channels)
    } else None
  }

  /** Header byte count to skip before the body (feature extraction reads
    * body bytes only). */
  private def headerLen(b: Array[Byte]): Int =
    if (b.length >= 33 && (b(0) & 0xff) == 0x89 && b(1) == 'P') 33
    else if (b.length >= 44 && b(0) == 'R' && b(1) == 'I') 44
    else if (b.length >= 30 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) 30
    else 0

  /** Synthesize a binary "media" column from the documents table — a real
    * container header (PNG / JPEG / WAV) wrapping the text bytes, standing
    * in for an image/audio payload column at 100 TB. */
  def synthesizeBlobs(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val body = text.getBytes("UTF-8")
        val w = 16 + (id % 1024).toInt
        val h = 16 + (id % 768).toInt
        (id % 3) match {
          case 0 => Blob(id, Headers.png(w, h, body), "png")
          case 1 => Blob(id, Headers.jpeg(w, h, body), "jpg")
          case _ => Blob(id, Headers.wav(1, 16000, body), "wav")
        }
    }
  }

  /** Batched decode + feature extraction. Batches of `batchSize` rows are
    * materialized per partition — the exact shape a vectorized
    * (Arrow/Pandas) UDF would see. Dimensions/channels come from REAL
    * header parsing ([[parseHeader]]); the byte-histogram "feature" over
    * the body stands in for pixel decode.
    *
    * STUB: a real implementation calls the codec for the pixel/sample
    * data here (e.g. libjpeg / ffmpeg per batch). The header metadata is
    * not stubbed.
    */
  def decodeFeatures(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[Features] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { b =>
          val (w, h, ch) = parseHeader(b.payload).getOrElse(
            (16 + (b.payload.length % 1024), 16 + ((b.payload.length / 7) % 768), 3))
          val off = headerLen(b.payload)
          val n = b.payload.length
          // === STUB DECODE (byte histogram over the body; replace with
          // codec call for real pixels/samples) ===
          val hist = new Array[Float](8)
          var i = off
          while (i < n) { hist((b.payload(i) & 0xff) >> 5) += 1f; i += 1 }
          if (n > off) { var j = 0; while (j < 8) { hist(j) /= (n - off); j += 1 } }
          Features(b.id, width = w, height = h, channels = ch,
            n_bytes = n - off, feature = hist)
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
