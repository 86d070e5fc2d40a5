package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.withMedia(
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("bytes")),
    "doc_id", "bytes").as[Multimodal.MediaRow]

  test("media frame carries binary payload + typed metadata") {
    val r = media.head()
    assert(r.payload.nonEmpty)
    assert(r.width >= 1 && r.width <= 1920)
    assert(r.height >= 1 && r.height <= 1080)
  }

  test("feature extraction is partition-parallel and deterministic") {
    val f1 = Multimodal.extractFeatures(media, dim = 16)
      .filter(col("id") === 0).head()
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .filter(col("id") === 0).head()
    assert(f1.features.length == 16)
    assert(f1.features.toSeq == f2.features.toSeq) // partitioning-invariant
  }

  test("frame sampling explodes k frames per row") {
    val n = media.count()
    assert(Multimodal.sampleFrames(media, k = 3).count() == n * 3)
  }
}
