package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.api.GraftSession

/** CREATE INDEX maps to physical sort-clustering: compaction rewrites an
  * indexed table range-partitioned + sorted on the indexed columns, so
  * parquet min/max stats skip row groups for pushed predicates — the
  * Spark-native index_scan (no separate index structure). */
class IndexSpec extends SparkSpec {
  import spark.implicits._

  private def fileRanges(dir: java.io.File): Seq[(Long, Long)] =
    dir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(col("id")), max(col("id"))).head
        (r.getLong(0), r.getLong(1))
      }

  test("compact clusters an indexed table into disjoint key ranges") {
    val root = Files.createTempDirectory("graft_ix").toString
    val s = GraftSession(spark, root)
    s.execute("CREATE TABLE t (id BIGINT, v STRING)")
    s.execute("CREATE INDEX t_id ON t (id)")
    // three interleaved inserts: ids are NOT clustered on disk
    val r = new scala.util.Random(7)
    (0 until 3).foreach { b =>
      val ids = r.shuffle((0L until 3000L).filter(_ % 3 == b))
      s.insert("t", ids.map(i => (i, s"v$i")).toDF("id", "v"))
    }
    s.execute("CHECKPOINT t") // = compact
    val batches = new java.io.File(s"$root/t/data").listFiles()
      .filter(_.getName.startsWith("batch_"))
    assert(batches.length == 1)
    // AQE may coalesce this tiny fold into one file (correct at scale:
    // small data = few files); the index property is then in-file order
    val files = batches.head.listFiles()
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    if (files.length > 1) {
      val ranges = fileRanges(batches.head).sortBy(_._1)
      ranges.sliding(2).foreach { case Seq(a, b) =>
        assert(a._2 <= b._1, s"overlapping indexed ranges $a / $b")
      }
    } else {
      val ids = spark.read.parquet(files.head.getPath)
        .select("id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), "single file must be sorted")
    }
    // data intact
    assert(s.execute("SELECT count(*) AS n FROM t").as[Long].head() == 3000)
  }

  test("index persists across restarts and keeps clustering compactions") {
    val root = Files.createTempDirectory("graft_ix2").toString
    val s1 = GraftSession(spark, root)
    s1.execute("CREATE TABLE t (id BIGINT, v STRING)")
    s1.execute("CREATE INDEX t_id ON t (id)")

    val s2 = GraftSession(spark, root)
    assert(s2.listIndexes == Map("t_id" -> ("t", Seq("id"))))
    s2.insert("t", (0L until 500L).map(i => (499L - i, s"v$i"))
      .toDF("id", "v"))
    s2.insert("t", (500L until 1000L).map(i => (1499L - i, s"v$i"))
      .toDF("id", "v"))
    s2.compactSmall("t", smallBytes = Long.MaxValue)
    val batches = new java.io.File(s"$root/t/data").listFiles()
      .filter(_.getName.startsWith("batch_"))
    assert(batches.length == 1)
    val ranges = fileRanges(batches.head).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._1)
      case _ => ()
    }
    s2.execute("DROP INDEX t_id")
    val s3 = GraftSession(spark, root)
    assert(s3.listIndexes.isEmpty)
  }
}
