package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.GraftSession

/** Mirrors the reference's dynamic-schema + DML integration tests
  * (integration/cpp/test/test_sql_features.cpp dynamic_schema_* suite,
  * test_returning.cpp). */
class GraftSessionSpec extends SparkSpec {
  import spark.implicits._

  private def freshSession(): GraftSession =
    GraftSession(spark, graft.TmpDirs.create("graft"))

  test("dynamic schema basic flow: columns appear per insert") {
    val g = freshSession()
    g.createDynamicTable("t")
    g.insert("t", Seq(("id1", 1L, "x")).toDF("_id", "a", "b"))
    g.insert("t", Seq(("id2", 2L, "y", 3.14)).toDF("_id", "a", "b", "c"))
    g.insert("t", Seq(("id3", 100L)).toDF("_id", "alpha"))
    val out = g.table("t").orderBy("_id").collect()
    assert(g.table("t").columns.toSeq == Seq("_id", "a", "b", "c", "alpha"))
    assert(out.length == 3)
    assert(out(0).getAs[Any]("c") == null) // earlier rows read NULL
    assert(out(2).getAs[Long]("alpha") == 100L)
  }

  test("type evolution multistep: int -> long -> string, old data preserved") {
    val g = freshSession()
    g.createDynamicTable("t")
    g.insert("t", Seq((1, 10)).toDF("_id", "v"))
    g.insert("t", Seq((2, 20L)).toDF("_id", "v"))
    g.insert("t", Seq((3, "thirty")).toDF("_id", "v"))
    val out = g.table("t").orderBy("_id").collect()
    assert(g.table("t").schema("v").dataType == StringType)
    assert(out.map(_.getString(1)).toSeq == Seq("10", "20", "thirty"))
  }

  test("drop then re-add preserves old data (tombstone semantics)") {
    val g = freshSession()
    g.createDynamicTable("t")
    g.insert("t", Seq((1, "keep")).toDF("_id", "x"))
    g.dropColumn("t", "x")
    assert(g.table("t").columns.toSeq == Seq("_id"))
    g.addColumn("t", "x", StringType)
    val out = g.table("t").collect()
    assert(out.head.getString(1) == "keep")
  }

  test("rename column serves old physical data under the new name") {
    val g = freshSession()
    g.createDynamicTable("t")
    g.insert("t", Seq((1, 5L)).toDF("_id", "old"))
    g.renameColumn("t", "old", "neu")
    assert(g.table("t").columns.toSeq == Seq("_id", "neu"))
    assert(g.table("t").select("neu").as[Long].head() == 5L)
  }

  test("fixed table rejects unknown columns") {
    val g = freshSession()
    g.createTable("f", StructType(Seq(StructField("a", LongType))))
    intercept[IllegalArgumentException] {
      g.insert("f", Seq((1L, 2L)).toDF("a", "zzz"))
    }
  }

  test("update with RETURNING") {
    val g = freshSession()
    g.createTable("t", StructType(Seq(StructField("id", LongType),
      StructField("v", LongType))))
    g.insert("t", Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"))
    val ret = g.update("t", Map("v" -> (col("v") + 1)), col("id") >= 2)
    assert(ret.select("v").as[Long].collect().sorted.toSeq == Seq(21L, 31L))
    assert(g.table("t").agg(sum("v")).as[Long].head() == 10 + 21 + 31)
  }

  test("delete with RETURNING") {
    val g = freshSession()
    g.createTable("t", StructType(Seq(StructField("id", LongType))))
    g.insert("t", (1L to 10L).toDF("id"))
    val ret = g.delete("t", col("id") > 7)
    assert(ret.count() == 3)
    assert(g.table("t").count() == 7)
  }

  test("update from a joined source (UPDATE ... FROM)") {
    val g = freshSession()
    g.createTable("t", StructType(Seq(StructField("id", LongType),
      StructField("v", LongType))))
    g.insert("t", Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v"))
    val adj = Seq((1L, 100L), (3L, 300L)).toDF("a_id", "bonus")
    val ret = g.updateFrom("t", adj, col("id") === col("a_id"),
      Map("v" -> (col("v") + col("bonus"))))
    assert(ret.count() == 2)
    assert(g.table("t").orderBy("id").select("v").as[Long].collect().toSeq
      == Seq(110L, 20L, 330L))
  }

  test("compact merges batches and drops tombstoned columns physically") {
    val g = freshSession()
    g.createDynamicTable("t")
    g.insert("t", Seq((1, "a")).toDF("_id", "x"))
    g.insert("t", Seq((2, "b", 5.0)).toDF("_id", "x", "y"))
    g.dropColumn("t", "y")
    g.compact("t")
    val out = g.table("t").orderBy("_id").collect()
    assert(out.length == 2 && g.table("t").columns.toSeq == Seq("_id", "x"))
    // re-adding y after compact does NOT resurrect data (physically gone)
    g.addColumn("t", "y", DoubleType)
    assert(g.table("t").filter(col("y").isNotNull).count() == 0)
  }

  test("views and matviews with refresh") {
    val g = freshSession()
    g.createTable("base", StructType(Seq(StructField("v", LongType))))
    g.insert("base", Seq(1L, 2L, 3L).toDF("v"))
    g.createView("doubled", "SELECT v * 2 AS d FROM base")
    assert(g.sql("SELECT sum(d) AS s FROM doubled").as[Long].head() == 12L)
    g.createMatView("mv", "SELECT sum(v) AS s FROM base")
    assert(g.table("mv").as[Long].head() == 6L)
    g.insert("base", Seq(10L).toDF("v"))
    assert(g.table("mv").as[Long].head() == 6L) // stale until refresh
    g.refreshMatView("mv")
    assert(g.table("mv").as[Long].head() == 16L)
  }

  test("sequences are monotonic and persistent") {
    val g = freshSession()
    assert(g.nextSequence("s") == 1L)
    assert(g.nextSequence("s") == 2L)
    assert(g.nextSequence("other") == 1L)
  }

  test("metadata survives a fresh session over the same root") {
    val root = graft.TmpDirs.create("graft")
    val g1 = GraftSession(spark, root)
    g1.createDynamicTable("t")
    g1.insert("t", Seq((1, "a")).toDF("_id", "x"))
    g1.dropColumn("t", "x")
    val g2 = GraftSession(spark, root)
    assert(g2.table("t").columns.toSeq == Seq("_id"))
  }

  test("compactSmall folds only the small-batch tail") {
    import scala.jdk.CollectionConverters._
    val root = graft.TmpDirs.create("graft")
    val g = GraftSession(spark, root)
    g.createTable("ct", StructType(Seq(StructField("k", LongType))))
    g.insert("ct", spark.range(5000).select(col("id").as("k"))) // large
    g.insert("ct", Seq(9001L).toDF("k"))                        // small
    g.insert("ct", Seq(9002L, 9003L).toDF("k"))                 // small
    val dataDir = java.nio.file.Paths.get(root, "ct", "data")
    def dirs() = Files.list(dataDir).iterator.asScala
      .map(_.getFileName.toString).toSeq.sorted
    val before = dirs()
    assert(before.size == 3)
    g.compactSmall("ct", smallBytes = 10000L)
    val after = dirs()
    assert(after.contains(before(0)), "large batch must stay in place")
    assert(!after.contains(before(1)) && !after.contains(before(2)),
      "small batches must fold into one new batch")
    assert(after.size == 2)
    assert(g.table("ct").count() == 5003)
    assert(g.table("ct").filter(col("k") >= 9001L).count() == 3)
    // a second pass with only one small batch left is a no-op
    val stable = dirs()
    g.compactSmall("ct", smallBytes = 10000L)
    assert(dirs() == stable)
  }

  test("insert auto-compacts above the batch-count threshold") {
    import scala.jdk.CollectionConverters._
    val root = graft.TmpDirs.create("graft")
    val g = GraftSession(spark, root)
    g.autoCompactThreshold = 8
    g.createTable("ac", StructType(Seq(StructField("k", LongType))))
    (1L to 100L).foreach(i => g.insert("ac", Seq(i).toDF("k")))
    val dataDir = java.nio.file.Paths.get(root, "ac", "data")
    val n = Files.list(dataDir).iterator.asScala.size
    assert(n <= 8, s"batch count $n exceeds the 8-batch policy ceiling")
    // nothing lost or duplicated by the repeated folds
    assert(g.table("ac").count() == 100)
    assert(g.table("ac").agg(sum(col("k"))).head().getLong(0) == 5050L)
    // plan width is bounded too: one scan arm per surviving batch dir
    val arms = g.table("ac").queryExecution.optimizedPlan.collectLeaves().size
    assert(arms <= 8, s"$arms plan leaves for an 8-batch ceiling")
  }

  test("3-level view chain registers topologically, adverse names included") {
    val g = freshSession()
    g.createTable("vt", StructType(Seq(StructField("k", LongType))))
    g.insert("vt", Seq(1L, 2L, 3L).toDF("k"))
    // alphabetical order (a_top, b_mid, c_base) is the REVERSE of the
    // dependency order — only a real topological sort registers these in
    // one pass
    g.createView("c_base", "SELECT k FROM vt WHERE k > 1")
    g.createView("b_mid", "SELECT k + 10 AS k FROM c_base")
    g.createView("a_top", "SELECT sum(k) AS s FROM b_mid")
    assert(g.sql("SELECT s FROM a_top").as[Long].head() == 25L)
  }

  test("a referenced view's real analysis error surfaces, not 'not found'") {
    val g = freshSession()
    g.createTable("et", StructType(Seq(StructField("k", LongType))))
    g.insert("et", Seq(1L).toDF("k"))
    g.createView("ev", "SELECT missing_col FROM et")
    val e = intercept[IllegalStateException] { g.sql("SELECT * FROM ev") }
    assert(e.getMessage.contains("ev"))
    assert(e.getMessage.toLowerCase.contains("missing_col"))
  }

  test("sql registers only the relations the statement references") {
    val g = freshSession()
    val schema = StructType(Seq(StructField("k", LongType)))
    (1 to 50).foreach(i => g.createTable(s"lzreg_t$i", schema))
    g.insert("lzreg_t1", Seq(1L, 2L).toDF("k"))
    g.insert("lzreg_t2", Seq(2L, 3L).toDF("k"))
    val out = g.sql(
      "SELECT a.k FROM lzreg_t1 a JOIN lzreg_t2 b ON a.k = b.k")
    assert(out.as[Long].collect().toSeq == Seq(2L))
    assert(spark.catalog.tableExists("lzreg_t1"))
    assert(spark.catalog.tableExists("lzreg_t2"))
    // the other 48 were never materialized as temp views
    (3 to 50).foreach(i => assert(!spark.catalog.tableExists(s"lzreg_t$i"),
      s"lzreg_t$i should not have been registered"))
  }

  test("sql pulls view dependencies in transitively (view over view)") {
    val g = freshSession()
    g.createTable("lzv_base", StructType(Seq(StructField("v", LongType))))
    g.insert("lzv_base", Seq(1L, 2L, 3L).toDF("v"))
    g.createView("lzv_inner", "SELECT v * 2 AS d FROM lzv_base")
    g.createView("lzv_outer", "SELECT sum(d) AS s FROM lzv_inner")
    // referencing only the OUTER view must register base + inner too
    assert(g.sql("SELECT s FROM lzv_outer").as[Long].head() == 12L)
  }
}
