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
    val root = graft.TmpDirs.create("graft_ix")
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

  /** Per-row-group (min, max) of column `id` straight from the parquet
    * footers — the exact statistics the reader's row-group skip uses. */
  private def rowGroupRanges(batchDir: java.io.File): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    batchDir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new HPath(f.getPath),
          spark.sparkContext.hadoopConfiguration)
        val r = ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "id").get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        } finally r.close()
      }
  }

  test("clustered layout SKIPS row groups at read time (vs unclustered)") {
    val root = graft.TmpDirs.create("graft_ix3")
    val s = GraftSession(spark, root)
    s.execute("CREATE TABLE t (id BIGINT, v STRING)")
    s.execute("CREATE INDEX t_id ON t (id)")
    val n = 40000L
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((0L until n).toVector)
      .map(i => (i, s"v$i")).toDF("id", "v")
    // tiny parquet row groups: at test scale AQE coalesces the rewrite
    // into few files, and skipping is per ROW GROUP — a 64 KiB block
    // size gives every file many groups, the shape a 100 TB table has
    // with the default 128 MiB blocks
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    val (clustered, unclusteredDir) = try {
      s.insert("t", rows.repartition(8))
      s.execute("CHECKPOINT t") // rewrite range-clusters + sorts on id
      val cl = new java.io.File(s"$root/t/data").listFiles()
        .filter(_.getName.startsWith("batch_")).head
      // unclustered control: same rows, random 8-way layout
      val un = graft.TmpDirs.createPath("graft_ix3u")
        .resolve("t").toString
      rows.repartition(8).write.parquet(un)
      (cl, un)
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }

    val (lo, hi) = (1000L, 1999L) // a 2.5% range predicate
    def qualifying(rs: Seq[(Long, Long)]) =
      rs.count { case (mn, mx) => mn <= hi && mx >= lo }
    val cRanges = rowGroupRanges(clustered)
    val uRanges = rowGroupRanges(new java.io.File(unclusteredDir))
    assert(cRanges.size > 1, "need multiple row groups for a skip test")
    // footer stats: the clustered table confines the range to a strict
    // minority of row groups; every unclustered group spans it
    assert(qualifying(uRanges) == uRanges.size,
      s"control should qualify everywhere: ${uRanges}")
    assert(qualifying(cRanges) * 2 < cRanges.size,
      s"clustered ranges should mostly skip: $cRanges")

    // and the READ actually skips: the parquet scan materializes only
    // surviving row groups, so its output-rows metric (pre any Spark
    // re-filter) must be far below the control's full-table read
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("id").between(lo, hi))
      assert(df.count() == 1000)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }.head
      scan.metrics("numOutputRows").value
    }
    val (cRead, uRead) = (scanRows(clustered.getPath),
      scanRows(unclusteredDir))
    assert(uRead == n, s"control scan should read everything, read $uRead")
    assert(cRead < n / 4,
      s"clustered scan should skip most of the table, read $cRead of $n")
  }

  test("index persists across restarts and keeps clustering compactions") {
    val root = graft.TmpDirs.create("graft_ix2")
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
