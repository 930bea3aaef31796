package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support for the training-data pipeline: opaque
  * binary payloads + typed metadata, batch decode / feature extraction /
  * frame sampling.
  *
  * Decode is REAL end to end: images (PNG / BMP / GIF / JPEG) go through
  * `javax.imageio.ImageIO` and per-channel pixel sums come from the
  * decoded raster; WAV payloads are parsed as RIFF containers and the
  * 16-bit PCM samples themselves are decoded and summed. Container
  * header sniffing ([[parseHeader]]) additionally parses PNG IHDR, BMP
  * BITMAPINFOHEADER, GIF logical screen descriptor, JPEG SOFn and
  * RIFF/WAVE fmt by hand for cheap metadata-only scans that skip pixel
  * decode entirely.
  *
  * The Spark-side plumbing is scale-shaped: binary columns flow through
  * parquet-style schemas, decode runs batched per partition (the Scala
  * analog of a vectorized Arrow/Pandas UDF batch), and everything stays
  * distributed — no collect anywhere.
  */
object Multimodal {

  // ImageIO's default stream cache spills through temp FILES per read —
  // keep codec I/O in memory (one in-memory stream per payload).
  ImageIO.setUseCache(false)

  case class Blob(id: Long, payload: Array[Byte], format: String)

  /** Decoded-media features: dimensions/channels plus EXACT per-channel
    * pixel sums (images) or the exact PCM sample sum (audio; stored in
    * sum_r, with width = sample count and height = 1). Integer sums keep
    * the oracle comparison exact — no float fuzz. */
  case class MediaFeatures(id: Long, format: String, width: Int, height: Int,
                           channels: Int, n_px: Long,
                           sum_r: Long, sum_g: Long, sum_b: Long)

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
    * carries; None for unrecognized payloads. For WAV the tuple is
    * (sample rate, 0, channels). */
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

  /** Pixel pattern for synthesized test images: a solid RGB fill derived
    * from the id, with pixel (0,0) forced white so decode has to see more
    * than one value. 251 (prime < 255) keeps the fill distinct from
    * white and avoids palette aliasing in GIF quantizers. */
  def imageParams(id: Long): (Int, Int, Int, Int, Int) = {
    val w = 16 + (id % 64).toInt
    val h = 16 + (id % 48).toInt
    ((w, h, (id % 251).toInt, (id * 7 % 251).toInt, (id * 13 % 251).toInt))
  }

  /** Deterministic 16-bit PCM test signal: 800 + id%256 mono samples of
    * ((id + 37 i) mod 2003) - 1001. */
  def wavParams(id: Long): Int = 800 + (id % 256).toInt

  def wavSample(id: Long, i: Int): Int = ((id + 37L * i) % 2003L).toInt - 1001

  private def encodeImage(id: Long, fmt: String): Array[Byte] = {
    val (w, h, r, g, b) = imageParams(id)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img.setRGB(0, 0, 0xffffff)
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, fmt, out), s"no ImageIO encoder for $fmt")
    out.toByteArray
  }

  private def encodeWav(id: Long): Array[Byte] = {
    val n = wavParams(id)
    val body = java.nio.ByteBuffer.allocate(2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { body.putShort(wavSample(id, i).toShort); i += 1 }
    Headers.wav(1, 16000, body.array())
  }

  /** Synthesize a binary "media" column from the documents table: REAL
    * encoded payloads — ImageIO-written PNG/BMP/GIF plus 16-bit PCM WAV —
    * deterministic in doc_id, standing in for an image/audio column at
    * 100 TB. */
  def synthesizeMedia(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // codec work (ImageIO encode/decode, PCM synth) is milliseconds per
    // row; the doc scan often arrives in 1-2 partitions and would pin
    // every downstream media pass to as many cores. Spread the 8-byte
    // ids cluster-wide first — the shuffle is noise next to one codec
    // call, at any scale.
    docs.select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long].map { id =>
      (id % 4) match {
        case 0 => Blob(id, encodeImage(id, "png"), "png")
        case 1 => Blob(id, encodeImage(id, "bmp"), "bmp")
        case 2 => Blob(id, encodeImage(id, "gif"), "gif")
        case _ => Blob(id, encodeWav(id), "wav")
      }
    }
  }

  /** Decode one image payload to exact per-channel pixel sums. */
  private def decodeImage(b: Blob): MediaFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(b.payload))
    require(img != null, s"ImageIO could not decode payload for id=${b.id}")
    val (w, h) = (img.getWidth, img.getHeight)
    val channels = img.getColorModel.getNumColorComponents
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y) // sRGB regardless of storage layout
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    MediaFeatures(b.id, b.format, w, h, channels, w.toLong * h, sr, sg, sb)
  }

  /** Decode a RIFF/WAVE payload: walk the chunks to fmt + data and sum
    * the 16-bit little-endian PCM samples exactly. */
  private def decodeWav(b: Blob): MediaFeatures = {
    val buf = java.nio.ByteBuffer.wrap(b.payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(0) == 0x46464952, s"not RIFF: id=${b.id}") // "RIFF"
    var pos = 12 // past RIFF size + WAVE
    var channels = 1
    var bits = 16
    var sum = 0L
    var nSamples = 0
    while (pos + 8 <= b.payload.length) {
      val tag = buf.getInt(pos)
      val len = buf.getInt(pos + 4)
      if (tag == 0x20746d66) { // "fmt "
        channels = buf.getShort(pos + 10)
        bits = buf.getShort(pos + 22)
      } else if (tag == 0x61746164) { // "data"
        require(bits == 16, s"only 16-bit PCM supported, got $bits")
        nSamples = len / 2
        var i = 0
        while (i < nSamples) { sum += buf.getShort(pos + 8 + 2 * i); i += 1 }
      }
      pos += 8 + len + (len & 1) // RIFF pads odd chunks to word boundary
    }
    MediaFeatures(b.id, b.format, nSamples / math.max(1, channels), 1,
      channels, nSamples.toLong, sum, 0L, 0L)
  }

  final case class AudioWindow(id: Long, win: Int, n: Int, sum_sq: Long,
                               peak: Int)

  /** Windowed audio features over the REAL PCM payload — the
    * training-pipeline energy/clipping signals (silence trimming, level
    * filtering) computed per fixed window of samples: exact integer
    * sum-of-squares and absolute peak, from the same RIFF chunk walk
    * the decoder uses. One flatMap pass, rows ∝ total audio length /
    * window — no shuffle, embarrassingly parallel at any corpus size. */
  def audioWindows(blobs: Dataset[Blob],
                   windowSamples: Int = 400): Dataset[AudioWindow] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.format == "wav").flatMap { b =>
      val buf = java.nio.ByteBuffer.wrap(b.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(buf.getInt(0) == 0x46464952, s"not RIFF: id=${b.id}")
      var pos = 12
      var dataPos = -1
      var nSamples = 0
      while (pos + 8 <= b.payload.length) {
        val tag = buf.getInt(pos)
        val len = buf.getInt(pos + 4)
        if (tag == 0x61746164) { dataPos = pos + 8; nSamples = len / 2 }
        pos += 8 + len + (len & 1) // RIFF pads odd chunks to word boundary
      }
      require(dataPos >= 0, s"no data chunk: id=${b.id}")
      val nWin = (nSamples + windowSamples - 1) / windowSamples
      (0 until nWin).iterator.map { w =>
        val from = w * windowSamples
        val until = math.min(nSamples, from + windowSamples)
        var sumSq = 0L
        var peak = 0
        var i = from
        while (i < until) {
          val s = buf.getShort(dataPos + 2 * i).toInt
          sumSq += s.toLong * s
          if (math.abs(s) > peak) peak = math.abs(s)
          i += 1
        }
        AudioWindow(b.id, w, until - from, sumSq, peak)
      }
    }
  }

  /** Batched REAL decode + feature extraction: batches of `batchSize`
    * rows are materialized per partition — the exact shape a vectorized
    * (Arrow/Pandas) UDF would see — then each payload goes through the
    * actual codec (ImageIO rasters / PCM samples). */
  def decodeMedia(blobs: Dataset[Blob], batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { b =>
          if (b.format == "wav") decodeWav(b) else decodeImage(b)
        }
      }
    }
  }

  /** Deterministic nearest-neighbor image resize over the binary
    * column — the training pipeline's "resize to model input" step.
    * A REAL ImageIO decode, an explicit source-index mapping
    * (sx = x*w/tw with integer division, so the result is bit-stable
    * across JVMs — no AWT interpolation variance), and a lossless PNG
    * re-encode. One mapPartitions pass over the blobs: no shuffle,
    * decode-bound, embarrassingly parallel at corpus scale — the same
    * posture as decodeMedia. Non-image payloads (wav) are dropped. */
  def resizeImages(blobs: Dataset[Blob], tw: Int, th: Int): Dataset[Blob] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.format != "wav").mapPartitions(_.map { b =>
      val img = ImageIO.read(new ByteArrayInputStream(b.payload))
      require(img != null, s"ImageIO could not decode payload for id=${b.id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new BufferedImage(tw, th, BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < th) {
        val sy = (y.toLong * h / th).toInt
        var x = 0
        while (x < tw) {
          out.setRGB(x, y, img.getRGB((x.toLong * w / tw).toInt, sy))
          x += 1
        }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(out, "png", bos)
      Blob(b.id, bos.toByteArray, "png")
    })
  }

  /** Deterministic nearest-neighbor PCM resample to a fixed sample
    * count — the audio pipeline's "fixed-length model input" step.
    * Walks the real RIFF chunks to the 16-bit data, remaps with
    * integer-division source indices (bit-stable), re-encodes WAV.
    * Same one-pass no-shuffle posture as resizeImages; non-audio
    * payloads are dropped. */
  def resampleAudio(blobs: Dataset[Blob], targetN: Int): Dataset[Blob] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.filter(_.format == "wav").mapPartitions(_.map { b =>
      val buf = java.nio.ByteBuffer.wrap(b.payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(buf.getInt(0) == 0x46464952, s"not RIFF: id=${b.id}")
      var pos = 12
      var rate = 16000
      var src: Array[Short] = null
      while (pos + 8 <= b.payload.length) {
        val tag = buf.getInt(pos)
        val len = buf.getInt(pos + 4)
        if (tag == 0x20746d66) rate = buf.getInt(pos + 12)
        else if (tag == 0x61746164) {
          src = Array.tabulate(len / 2)(i => buf.getShort(pos + 8 + 2 * i))
        }
        pos += 8 + len + (len & 1)
      }
      require(src != null, s"no data chunk: id=${b.id}")
      val body = java.nio.ByteBuffer.allocate(2 * targetN)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i < targetN) {
        body.putShort(src((i.toLong * src.length / targetN).toInt))
        i += 1
      }
      Blob(b.id, Headers.wav(1, rate, body.array()), "wav")
    })
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

  // ------------------------------------------------------------------
  // Video columns: a length-prefixed container of REAL encoded frames
  // ("GVID" magic, BE frame count, then [BE length][BMP bytes] per
  // frame). Frame sampling walks the index and decodes ONLY the
  // selected frames through the actual codec — the strided-decode
  // pattern a training pipeline uses so a 100 TB video column never
  // pays full-decode cost for a 1-in-N frame sample.
  // ------------------------------------------------------------------

  /** Frames per video and the uniform color of frame `f` of video
    * `id` — deterministic, so the oracle recomputes the sums. */
  def videoParams(id: Long): (Int, Int, Int) = // (nFrames, w, h)
    ((4 + (id % 9).toInt, 16 + (id % 16).toInt, 8 + (id % 8).toInt))

  def videoFrameColor(id: Long, f: Int): (Int, Int, Int) =
    (((id * 3 + f * 17) % 251).toInt, ((id * 7 + f * 29) % 251).toInt,
      ((id * 13 + f * 41) % 251).toInt)

  private def encodeVideo(id: Long): Array[Byte] = {
    val (n, w, h) = videoParams(id)
    val out = new ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeBytes("GVID")
    d.writeInt(n)
    var f = 0
    while (f < n) {
      val (r, g, b) = videoFrameColor(id, f)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val rgb = (r << 16) | (g << 8) | b
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val frame = new ByteArrayOutputStream()
      require(ImageIO.write(img, "bmp", frame), "no BMP encoder")
      d.writeInt(frame.size())
      frame.writeTo(d)
      f += 1
    }
    out.toByteArray
  }

  def synthesizeVideo(docs: DataFrame): Dataset[Blob] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .map(id => Blob(id, encodeVideo(id), "gvid"))
  }

  final case class FrameFeatures(id: Long, frame_idx: Int, width: Int,
                                 height: Int, sum_r: Long, sum_g: Long,
                                 sum_b: Long)

  /** Decode every `stride`th frame of each GVID payload. Non-sampled
    * frames are SKIPPED by length, never decoded; one flatMap pass,
    * rows ∝ frames/stride, no shuffle, no collect. */
  def sampleVideoFrames(blobs: Dataset[Blob],
                        stride: Int = 3): Dataset[FrameFeatures] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.flatMap { b =>
      val buf = java.nio.ByteBuffer.wrap(b.payload) // BE by default
      require(buf.getInt(0) == 0x47564944, s"not GVID: id=${b.id}") // "GVID"
      val n = buf.getInt(4)
      var pos = 8
      (0 until n).iterator.flatMap { f =>
        val len = buf.getInt(pos)
        val start = pos + 4
        pos = start + len
        if (f % stride != 0) None
        else {
          val img = ImageIO.read(
            new ByteArrayInputStream(b.payload, start, len))
          require(img != null, s"frame $f of id=${b.id} failed to decode")
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          Some(FrameFeatures(b.id, f, img.getWidth, img.getHeight,
            sr, sg, sb))
        }
      }
    }
  }
}
