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

  test("real WAV decode: PCM byte round-trip recovers exact amplitude stats") {
    import spark.implicits._
    val wav = Multimodal.testWav(3L)
    // genuine RIFF/WAVE container, not a synthetic stand-in
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val df = Seq(3L, 55L).toDF("doc_id")
      .as[Long].map(id => (id, Multimodal.testWav(id)))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeAudioStats(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    for (d <- Seq(3L, 55L)) {
      val n = 400 + d % 100
      val ss = (0L until n).map(i => ((d * 31 + i * 7) % 2001) - 1000)
      assert(got(d) == ((n, ss.sum, ss.min, ss.max)), s"d=$d")
    }
  }

  test("nearest-neighbor resize: explicit floor mapping, not interpolation") {
    import spark.implicits._
    val df = Seq(9L).toDF("doc_id")
      .as[Long].map(id => (id, Multimodal.testPng(id)))
      .toDF("doc_id", "payload")
    val r = Multimodal.decodeResizedStats(df, "doc_id", "payload", 4, 4)
      .collect().head
    val d = 9L
    val (w, h) = ((8 + d % 8).toInt, (8 + d % 5).toInt)
    val pts = for (i <- 0 until 4; j <- 0 until 4)
      yield (i * w / 4, j * h / 4)
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((pts.map(d + _._1).sum, pts.map(d + _._2).sum,
        pts.map(p => d + p._1 + p._2).sum)))
  }

  test("real PNG decode: byte round-trip recovers exact pixel sums") {
    import spark.implicits._
    // the payload really is a PNG (magic bytes), not a synthetic stand-in
    val png = Multimodal.testPng(7L)
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    val df = Seq(7L, 13L, 42L).toDF("doc_id")
      .as[Long].map(id => (id, Multimodal.testPng(id)))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeImageStats(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    for (d <- Seq(7L, 13L, 42L)) {
      val (w, h) = ((8 + d % 8).toInt, (8 + d % 5).toInt)
      val sr = (0 until h).map(_ => (0 until w).map(x => d + x).sum).sum
      val sg = (0 until w).map(_ => (0 until h).map(y => d + y).sum).sum
      val sb = (for (x <- 0 until w; y <- 0 until h) yield d + x + y).sum
      assert(got(d) == ((w, h, sr, sg, sb)), s"d=$d")
    }
  }

  test("real AVI: container is RIFF, demux recovers the exact frame bytes") {
    val avi = Multimodal.testAvi(11L, nFrames = 3)
    // the payload really is an AVI (RIFF magic + form type)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val frames = Multimodal.demuxAviFrames(avi)
    assert(frames.size == 3)
    // demux is byte-exact: frame f IS the PNG encoding of pattern d + f
    for (f <- 0 until 3)
      assert(frames(f).sameElements(Multimodal.testPng(11L + f)),
        s"frame $f bytes differ from the source PNG")
  }

  test("real AVI demux rejects non-RIFF and truncated payloads loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.demuxAviFrames("not a video".getBytes("US-ASCII"))
    }
    val avi = Multimodal.testAvi(3L, nFrames = 2)
    intercept[IllegalArgumentException] {
      // cut inside the movi LIST: a chunk size now points past the end
      Multimodal.demuxAviFrames(avi.take(avi.length - 5))
    }
    intercept[IllegalArgumentException] {
      Multimodal.testAvi(199L, nFrames = 4) // d + nFrames > 200
    }
  }

  test("real video decode: per-frame pixel sums match the closed forms") {
    import spark.implicits._
    val df = Seq(5L, 60L).toDF("doc_id")
      .as[Long].map(id => (id, Multimodal.testAvi(id, nFrames = 4)))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeVideoStats(df, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.size == 8)
    for (d <- Seq(5L, 60L); f <- 0 until 4) {
      val e = d + f
      val (w, h) = ((8 + e % 8).toInt, (8 + e % 5).toInt)
      val sr = (0 until h).map(_ => (0 until w).map(x => e + x).sum).sum
      val sg = (0 until w).map(_ => (0 until h).map(y => e + y).sum).sum
      val sb = (for (x <- 0 until w; y <- 0 until h) yield e + x + y).sum
      assert(got((d, f)) == ((w, h, sr, sg, sb)), s"d=$d f=$f")
    }
  }
}
