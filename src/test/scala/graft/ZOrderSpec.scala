package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.api.GraftSession
import graft.sources.ZOrder

/** Composite CREATE INDEX = Z-order clustering: interleaving the indexed
  * columns' bits keeps rows close in EVERY dimension close on disk, so
  * parquet min/max row-group stats prune range predicates on ANY indexed
  * column — where a lexicographic composite sort only prunes the leading
  * one. The read-side proof mirrors IndexSpec: footer stats AND the scan's
  * numOutputRows metric, against a lexicographic control. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits LSB-first (hand-computed Morton codes)") {
    val df = Seq((3L, 1L), (0L, 0L), (2L, 2L), (3L, 3L)).toDF("a", "b")
    // identity normalization: mins 0, maxs 3, bits 2 — a_i -> z bit 2i,
    // b_i -> z bit 2i+1. (3,1)=a0|b0<<1|a1<<2 = 1+2+4 = 7 (b1=0);
    // (2,2)= b0? no: a=10,b=10 -> a1<<2|b1<<3 = 4+8 = 12; (3,3)=15.
    val z = ZOrder.zValue(Seq(col("a"), col("b")),
      Seq(LongType, LongType), Seq(0L, 0L), Seq(3L, 3L), bits = 2)
    val got = df.select(col("a"), col("b"), z.as("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((3L, 1L)) == 7L)
    assert(got((2L, 2L)) == 12L)
    assert(got((3L, 3L)) == 15L)
  }

  test("zValue agrees with an independent Morton implementation (500 random tuples)") {
    // reference interleave written separately from the Column expression:
    // column j contributes bit i of its value to z bit i*k + j
    def morton(vs: Seq[Long], bits: Int): Long =
      (0 until bits).flatMap { i =>
        vs.zipWithIndex.map { case (v, j) =>
          ((v >> i) & 1L) << (i * vs.size + j)
        }
      }.reduce(_ | _)
    val rnd = new scala.util.Random(29)
    val top = 65535L
    val pairs = Vector.fill(500)((rnd.nextLong(top + 1),
      rnd.nextLong(top + 1)))
    val df2 = pairs.toDF("a", "b")
    val z2 = ZOrder.zValue(Seq(col("a"), col("b")),
      Seq(LongType, LongType), Seq(0L, 0L), Seq(top, top))
    df2.select(col("a"), col("b"), z2.as("z")).collect().foreach { r =>
      assert(r.getLong(2) == morton(Seq(r.getLong(0), r.getLong(1)), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // three columns — 48 z bits
    val triples = Vector.fill(200)((rnd.nextLong(top + 1),
      rnd.nextLong(top + 1), rnd.nextLong(top + 1)))
    val df3 = triples.toDF("a", "b", "c")
    val z3 = ZOrder.zValue(Seq(col("a"), col("b"), col("c")),
      Seq(LongType, LongType, LongType),
      Seq(0L, 0L, 0L), Seq(top, top, top))
    df3.select(col("a"), col("b"), col("c"), z3.as("z")).collect()
      .foreach { r =>
        assert(r.getLong(3) ==
          morton(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 16))
      }
  }

  test("clusterByZOrder falls back to the LEX layout, never unclustered") {
    // non-orderable types: rows still come back fully sorted on the cols
    val strs = Seq(("b", "2"), ("a", "1"), ("c", "3")).toDF("a", "b")
    val out = ZOrder.clusterByZOrder(strs, Seq("a", "b"))
    assert(out.schema == strs.schema)
    assert(out.rdd.glom().collect().forall(p =>
      p.map(_.getString(0)).toSeq == p.map(_.getString(0)).toSeq.sorted))
    // empty frames and all-NULL keys survive (no crash, same schema)
    val empty = spark.emptyDataFrame
      .select(lit(0L).as("a"), lit(0L).as("b")).filter(lit(false))
    assert(ZOrder.clusterByZOrder(empty, Seq("a", "b")).count() == 0)
    val allNull = Seq((1L, 2L)).toDF("a", "b")
      .select(lit(null).cast("long").as("a"), col("b"))
    assert(ZOrder.clusterByZOrder(allNull, Seq("a", "b")).count() == 1)
  }

  test("date columns and signed-64 extreme ranges z-cluster without error") {
    // regression: cast(date as long) is forbidden in Spark 4 (needs
    // unix_date), and a Long.Min..Long.Max range used to overflow the
    // span subtraction under ANSI
    val dates = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 1L),
      (java.sql.Date.valueOf("2024-06-01"), 2L),
      (java.sql.Date.valueOf("2024-12-31"), 3L))
      .toDF("d", "x")
    assert(ZOrder.clusterByZOrder(dates, Seq("d", "x")).count() == 3)
    val wide = Seq((Long.MinValue, 1L), (0L, 2L), (Long.MaxValue, 3L))
      .toDF("h", "x")
    val z = ZOrder.clusterByZOrder(wide, Seq("h", "x"))
    assert(z.count() == 3)
  }

  /** Per-row-group (min, max) of `column` from the parquet footers. */
  private def rowGroupRanges(dir: java.io.File,
                             column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    dir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = HadoopInputFile.fromPath(new HPath(f.getPath),
          spark.sparkContext.hadoopConfiguration)
        val r = ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toSeq.map { b =>
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        } finally r.close()
      }
  }

  test("composite index Z-orders: row groups skip on EITHER dimension") {
    val root = graft.TmpDirs.create("graft_zx")
    val s = GraftSession(spark, root)
    s.execute("CREATE TABLE t (a BIGINT, b BIGINT, v STRING)")
    s.execute("CREATE INDEX t_ab ON t (a, b)")
    val n = 40000L
    val rnd = new scala.util.Random(13)
    // two INDEPENDENT uniform keys — the hard case for lexicographic sort
    val as = rnd.shuffle((0L until n).toVector)
    val bs = rnd.shuffle((0L until n).toVector)
    val rows = as.zip(bs).map { case (a, b) => (a, b, s"v$a") }
      .toDF("a", "b", "v")
    // tiny row groups so skipping is observable at test scale (at 100 TB
    // the default 128 MiB blocks give the same many-groups shape)
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    val (zDir, lexDir) = try {
      s.insert("t", rows.repartition(8))
      s.execute("CHECKPOINT t") // composite index -> z-cluster rewrite
      val z = new java.io.File(s"$root/t/data").listFiles()
        .filter(_.getName.startsWith("batch_")).head
      // control: the lexicographic layout the OLD composite path produced
      val lex = graft.TmpDirs.createPath("graft_zxl").resolve("t").toString
      rows.repartitionByRange(col("a"), col("b"))
        .sortWithinPartitions(col("a"), col("b")).write.parquet(lex)
      (z, new java.io.File(lex))
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }

    val (lo, hi) = (1000L, 1999L) // 2.5% range predicate per dimension
    def qualifying(rs: Seq[(Long, Long)]) =
      rs.count { case (mn, mx) => mn <= hi && mx >= lo }
    val zA = rowGroupRanges(zDir, "a"); val zB = rowGroupRanges(zDir, "b")
    val lexB = rowGroupRanges(lexDir, "b")
    assert(zA.size > 4, s"need many row groups for a skip test: ${zA.size}")
    // z-layout: a strict minority of groups qualifies on EACH dimension
    // (each z-contiguous group covers a ~sqrt(1/G)-side square in (a,b))
    assert(qualifying(zA) * 2 < zA.size,
      s"a-ranges should mostly skip: ${qualifying(zA)} of ${zA.size}")
    assert(qualifying(zB) * 2 < zB.size,
      s"b-ranges should mostly skip: ${qualifying(zB)} of ${zB.size}")
    // lexicographic control: the trailing column's stats span everything —
    // no group can be skipped for a b-only predicate
    assert(qualifying(lexB) == lexB.size,
      s"lexicographic trailing-column stats should never skip: $lexB")

    // and the READ skips: scan metric counts only materialized row groups
    def scanRows(path: String, c: String): Long = {
      val df = spark.read.parquet(path).filter(col(c).between(lo, hi))
      assert(df.count() == 1000)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }.head
      scan.metrics("numOutputRows").value
    }
    val aRead = scanRows(zDir.getPath, "a")
    val bRead = scanRows(zDir.getPath, "b")
    val lexRead = scanRows(lexDir.getPath, "b")
    assert(lexRead == n, s"lex control reads everything for b, $lexRead")
    assert(aRead < n / 2, s"z-scan on a should skip: read $aRead of $n")
    assert(bRead < n / 2, s"z-scan on b should skip: read $bRead of $n")
  }
}
