package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction runs partition-parallel over the
  * bytes.
  *
  * The actual codecs (JPEG/PNG/audio) are NOT in this container, so
  * [[FakeDecoder]] is a clearly-marked deterministic stub — the Spark-side
  * contract (schema, batch shape, partitioning, typed mapPartitions
  * signature) is the real, tested part, and a production decoder drops in
  * by replacing one function. At 100 TB the binary column stays columnar
  * in parquet (never materialized on the driver) and decode is a narrow
  * map — no shuffle.
  */
object Multimodal {

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

  /** STUB decoder — stands in for a real image/audio decode.
    * Deterministic features derived from payload bytes so tests are
    * stable; replace the body with the real codec to productionize. */
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
