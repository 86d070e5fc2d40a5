package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs partition-parallel over the
  * bytes.
  *
  * IMAGE decode is REAL: the JDK ships `javax.imageio` (PNG/JPEG/BMP/GIF
  * readers, no external libraries), so [[decodeImageStats]] runs an
  * actual pixel decode partition-parallel over the binary column — see
  * m3_image_decode, whose encode→PNG-bytes→decode→stats round trip is
  * oracle-checked against closed-form pixel sums. Audio/video codecs are
  * NOT in this container, so [[FakeDecoder]] remains the clearly-marked
  * deterministic stub for those modalities — the Spark-side contract
  * (schema, batch shape, partitioning, typed mapPartitions signature) is
  * the real, tested part, and a production codec drops in by replacing
  * one function. At 100 TB the binary column stays columnar in parquet
  * (never materialized on the driver) and decode is a narrow map — no
  * shuffle.
  */
object Multimodal {

  case class ImageStats(id: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic RGB test pattern for id `d` (w = 8 + d%8,
    * h = 8 + d%5, r = d+x, g = d+y, b = d+x+y — all < 256 for d < 200),
    * encoded as REAL PNG bytes via the JDK encoder. Channel sums have
    * closed forms in d, which is what makes the decode oracle-checkable:
    *   Σr = h·(w·d + w(w−1)/2), Σg = w·(h·d + h(h−1)/2),
    *   Σb = w·h·d + h·w(w−1)/2 + w·h(h−1)/2. */
  def testPng(d: Long): Array[Byte] = {
    require(d >= 0 && d < 200, s"testPng pattern needs 0 <= d < 200, got $d")
    val (w, h) = ((8 + d % 8).toInt, (8 + d % 5).toInt)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = ((d + x).toInt, (d + y).toInt, (d + x + y).toInt)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode (JDK ImageIO — PNG/JPEG/BMP/GIF) as a typed
    * partition-parallel map: dimensions + per-channel pixel sums per
    * image. PNG is lossless truecolor, so the sums are exact integers —
    * deterministic on any JVM. One narrow pass, no shuffle; bytes never
    * touch the driver. */
  def decodeImageStats(df: DataFrame, idCol: String,
                       payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for id $id")
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
          ImageStats(id, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }
      .toDF()
  }

  case class MediaRow(id: Long, payload: Array[Byte], format: String,
                      width: Int, height: Int)
  case class FeatureRow(id: Long, features: Array[Float])

  /** Attach a payload + metadata struct to any DataFrame with an id and a
    * binary-able column (here: utf-8 text bytes standing in for media). */
  def withMedia(df: DataFrame, idCol: String, bytesCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(bytesCol).as("payload"),
      lit("fake/raw").as("format"),
      (pmod(xxhash64(col(idCol)), lit(1920)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(idCol), lit(1)), lit(1080)) + 1).cast("int").as("height"))

  case class ResizedStats(id: Long, width: Int, height: Int,
                          sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL decode + RESIZE: nearest-neighbor downsample to (w2, h2) with
    * the explicit floor mapping src = (dst·srcDim) / dstDim — implemented
    * as a manual pixel loop, NOT Graphics2D scaling, precisely so the
    * result is bit-deterministic on any JVM (interpolated scaling is
    * implementation-defined; nearest-neighbor index math is not). Output
    * per image: resized dims + exact per-channel sums of the resized
    * pixels. Narrow map, no shuffle. */
  def decodeResizedStats(df: DataFrame, idCol: String, payloadCol: String,
                         w2: Int, h2: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"undecodable image payload for id $id")
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var j = 0
          while (j < h2) {
            val sy = (j.toLong * h / h2).toInt
            var i = 0
            while (i < w2) {
              val sx = (i.toLong * w / w2).toInt
              val p = img.getRGB(sx, sy)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              i += 1
            }
            j += 1
          }
          ResizedStats(id, w2, h2, sr, sg, sb)
        }
      }
      .toDF()
  }

  case class AudioStats(id: Long, n_samples: Long, sum_amp: Long,
                        min_amp: Long, max_amp: Long)

  /** Deterministic 16-bit mono PCM test signal for id `d`
    * (n = 400 + d%100 samples, sample(i) = ((d·31 + i·7) mod 2001) −
    * 1000), encoded as a REAL RIFF/WAVE file via the JDK's
    * javax.sound.sampled writer. PCM is lossless, so the decode oracle
    * is the closed form of the generator. */
  def testWav(d: Long): Array[Byte] = {
    require(d >= 0, s"testWav needs d >= 0, got $d")
    val n = (400 + d % 100).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (((d * 31 + i.toLong * 7) % 2001) - 1000).toShort
      pcm(2 * i) = (s & 0xff).toByte            // little-endian
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** REAL audio decode (JDK javax.sound.sampled — RIFF/WAVE PCM) as a
    * partition-parallel map: sample count and exact amplitude
    * sum/min/max per clip. 16-bit PCM round-trips losslessly, so the
    * stats are exact integers on any JVM. Narrow map, no shuffle. */
  def decodeAudioStats(df: DataFrame, idCol: String,
                       payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
            s"expected 16-bit mono PCM for id $id, got $fmt")
          val raw = ais.readAllBytes()
          val n = raw.length / 2
          var (sum, mn, mx) = (0L, Long.MaxValue, Long.MinValue)
          var i = 0
          while (i < n) {
            val lo = raw(2 * i) & 0xff
            val hi = raw(2 * i + 1).toInt
            val s = (if (fmt.isBigEndian) (lo << 8) | (hi & 0xff)
                     else (hi << 8) | lo).toShort.toLong
            sum += s; if (s < mn) mn = s; if (s > mx) mx = s
            i += 1
          }
          AudioStats(id, n.toLong, sum, mn, mx)
        }
      }
      .toDF()
  }

  /** STUB decoder — stands in for codecs the JDK does NOT ship (video,
    * compressed audio); images and PCM WAV audio have REAL decoders
    * above. Deterministic features derived from payload bytes so tests
    * are stable; replace the body with the real codec to productionize. */
  object FakeDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i); i += 1
      }
      i = 0
      while (i < dim) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17
        out(i) = (h % 1000) / 1000.0f; i += 1
      }
      out
    }
  }

  /** Feature extraction as a typed partition-parallel map: the batch shape
    * (iterator-of-rows per partition, no driver round-trip) is exactly what
    * a vectorized decoder needs — it can batch rows internally, pin one
    * codec context per partition, and stream results out. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // one "decoder context" per partition (stub: nothing to init)
      rows.map(r => FeatureRow(r.id, FakeDecoder.decode(r.payload, dim)))
    }
  }

  /** Frame-sampling shape for video-like payloads: explode k deterministic
    * "frames" per row — a generator (flatMap), still narrow/no-shuffle. */
  def sampleFrames(media: Dataset[MediaRow], k: Int): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      (0 until k).iterator.map { f =>
        FeatureRow(r.id * 1000 + f,
          FakeDecoder.decode(r.payload :+ f.toByte, 8))
      }
    }
  }
}
