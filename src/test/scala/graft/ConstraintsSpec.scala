package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.GraftSession

/** Mirrors the reference constraint tests (test_sql_features.cpp:
  * check_constraint, fk_enforcement, fk_cascade_delete, fk_set_null,
  * fk_cascade_restrict). */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def sessionWithParentChild(): GraftSession = {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("parent", StructType(Seq(StructField("id", LongType))))
    g.createTable("child", StructType(Seq(
      StructField("id", LongType), StructField("pid", LongType))))
    g.insert("parent", Seq(1L, 2L, 3L).toDF("id"))
    g
  }

  test("CHECK constraint rejects violating inserts") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("t", StructType(Seq(StructField("v", LongType))))
    g.addCheckConstraint("t", "v_positive", "v > 0")
    g.insert("t", Seq(1L, 2L).toDF("v"))
    intercept[IllegalStateException] {
      g.insert("t", Seq(3L, -1L).toDF("v"))
    }
    assert(g.table("t").count() == 2) // failed batch not applied
  }

  test("FK insert enforcement (orphans rejected)") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id")
    g.insert("child", Seq((10L, 1L)).toDF("id", "pid"))
    intercept[IllegalStateException] {
      g.insert("child", Seq((11L, 99L)).toDF("id", "pid"))
    }
    assert(g.table("child").count() == 1)
  }

  test("FK RESTRICT blocks parent delete while children exist") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id", g.Restrict)
    g.insert("child", Seq((10L, 1L)).toDF("id", "pid"))
    intercept[IllegalStateException] { g.delete("parent", col("id") === 1L) }
    g.delete("parent", col("id") === 3L) // unreferenced: fine
    assert(g.table("parent").count() == 2)
  }

  test("TRUNCATE refuses an FK-referenced parent, like PG") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id", g.Restrict)
    // refusal is based on the constraint's existence, not on rows: PG
    // refuses even when the child table is empty
    intercept[IllegalStateException] { g.truncateTable("parent") }
    assert(g.table("parent").count() == 3) // untouched
    // the child side (not referenced by anything) truncates fine
    g.insert("child", Seq((10L, 1L)).toDF("id", "pid"))
    g.truncateTable("child")
    assert(g.table("child").count() == 0)
    // a self-referential FK does not block: all rows vanish together
    val g2 = GraftSession(spark, graft.TmpDirs.create("graft"))
    g2.createTable("tree", StructType(Seq(
      StructField("id", LongType), StructField("up", LongType))))
    g2.addForeignKey("tree", "up", "tree", "id", g2.Cascade)
    g2.insert("tree", Seq((1L, Option.empty[Long])).toDF("id", "up"))
    g2.insert("tree", Seq((2L, Some(1L))).toDF("id", "up"))
    g2.truncateTable("tree")
    assert(g2.table("tree").count() == 0)
  }

  test("FK CASCADE deletes children with the parent") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id", g.Cascade)
    g.insert("child", Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("id", "pid"))
    g.delete("parent", col("id") === 1L)
    assert(g.table("child").select("id").as[Long].collect().sorted.toSeq
      == Seq(12L))
  }

  test("self-referential FK CASCADE deletes the transitive closure in one rewrite") {
    // org-chart shape: 1 <- 2 <- 3 <- 4, plus an unrelated 10 <- 11
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("emp", StructType(Seq(
      StructField("id", LongType), StructField("mgr", LongType))))
    g.insert("emp", Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, java.lang.Long.valueOf(1L)), (3L, java.lang.Long.valueOf(2L)),
      (4L, java.lang.Long.valueOf(3L)), (10L, null.asInstanceOf[java.lang.Long]),
      (11L, java.lang.Long.valueOf(10L)))
      .toDF("id", "mgr"))
    g.addForeignKey("emp", "mgr", "emp", "id", g.Cascade)
    val returned = g.delete("emp", col("id") === 1L)
    // RETURNING carries the whole doomed closure, not just the direct match
    assert(returned.select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L))
    assert(g.table("emp").select("id").as[Long].collect().sorted.toSeq
      == Seq(10L, 11L))
  }

  test("self-referential FK RESTRICT blocks only when survivors still reference") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("emp", StructType(Seq(
      StructField("id", LongType), StructField("mgr", LongType))))
    g.insert("emp", Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, java.lang.Long.valueOf(1L))).toDF("id", "mgr"))
    g.addForeignKey("emp", "mgr", "emp", "id", g.Restrict)
    intercept[IllegalStateException] { g.delete("emp", col("id") === 1L) }
    // deleting parent AND child in one statement leaves no dangling survivor
    g.delete("emp", col("id") <= 2L)
    assert(g.table("emp").count() == 0)
  }

  test("self-referential FK SET NULL orphans surviving children") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("emp", StructType(Seq(
      StructField("id", LongType), StructField("mgr", LongType))))
    g.insert("emp", Seq((1L, null.asInstanceOf[java.lang.Long]),
      (2L, java.lang.Long.valueOf(1L)), (3L, java.lang.Long.valueOf(2L)))
      .toDF("id", "mgr"))
    g.addForeignKey("emp", "mgr", "emp", "id", g.SetNull)
    g.delete("emp", col("id") === 1L)
    val rows = g.table("emp").orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq == Seq((2L, -1L), (3L, 2L)))
  }

  test("CASCADE over 1e5 keys runs join-based (no driver literal list)") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("parent", StructType(Seq(StructField("id", LongType))))
    g.createTable("child", StructType(Seq(
      StructField("id", LongType), StructField("pid", LongType))))
    val n = 100000L
    g.insert("parent", spark.range(n).select(col("id")))
    g.insert("child", spark.range(2 * n)
      .select(col("id"), (col("id") % n).as("pid")))
    g.addForeignKey("child", "pid", "parent", "id", g.Cascade)
    // the old isin-literal path would build a 100k-literal Expression tree
    g.delete("parent", col("id") < n / 2)
    assert(g.table("parent").count() == n / 2)
    assert(g.table("child").count() == n) // half of 2n cascade-deleted
  }

  test("FK insert check works against a parent AQE will not broadcast") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("parent", StructType(Seq(StructField("id", LongType))))
    g.createTable("child", StructType(Seq(
      StructField("id", LongType), StructField("pid", LongType))))
    g.insert("parent", spark.range(100000L).select(col("id")))
    g.addForeignKey("child", "pid", "parent", "id")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // with the threshold at 1 KB the distinct parent-key set is "too big
      // to broadcast" — the old forced-broadcast hint would have shipped it
      // to every task regardless; the unhinted anti-join must still work
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      g.insert("child", spark.range(1000L)
        .select(col("id"), (col("id") * 100).as("pid")))
      intercept[IllegalStateException] {
        g.insert("child", Seq((999999L, -5L)).toDF("id", "pid"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    assert(g.table("child").count() == 1000L)
  }

  test("dropTable drops dependent views transitively; refresh does not") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("base", StructType(Seq(StructField("v", LongType))))
    g.insert("base", Seq(1L, 2L, 3L).toDF("v"))
    g.createView("v1", "SELECT v * 10 AS w FROM base")
    g.createView("v2", "SELECT COUNT(*) AS n FROM v1")
    assert(g.sql("SELECT n FROM v2").head().getLong(0) == 3L)
    // matview over base, and a view over the matview: refresh must keep it
    g.createMatView("m1", "SELECT SUM(v) AS s FROM base")
    g.createView("vm", "SELECT s + 1 AS s1 FROM m1")
    g.insert("base", Seq(10L).toDF("v"))
    g.refreshMatView("m1")
    assert(g.sql("SELECT s1 FROM vm").head().getLong(0) == 17L)
    // a table named like a SQL keyword must not capture keyword mentions:
    // vk has ORDER BY but does not reference table `order`
    g.createTable("order", StructType(Seq(StructField("o", LongType))))
    g.createView("vk", "SELECT v FROM base ORDER BY v")
    g.dropTable("order")
    assert(g.sql("SELECT v FROM vk").count() == 4L)
    // dropping the base table walks the dependency closure: v1, v2, m1,
    // vm, vk — parser-level reference detection, subqueries included
    g.createView("vs", "SELECT 1 AS one WHERE EXISTS (SELECT * FROM base)")
    g.dropTable("base")
    for (v <- Seq("v1", "v2", "m1", "vm", "vk", "vs"))
      intercept[Exception] { g.sql(s"SELECT * FROM $v").collect() }
  }

  test("two self-FK CASCADEs on same-typed columns keep column identity") {
    // mgr and mentor are both LONG: a positional union of the per-FK
    // semi-joins would put one column's values under the other's name and
    // delete the wrong transitive closure
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("emp", StructType(Seq(
      StructField("id", LongType), StructField("mgr", LongType),
      StructField("mentor", LongType))))
    // 1 manages 2; 2 mentors 3; nobody references 4 via either edge
    g.insert("emp", Seq(
      (1L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[java.lang.Long]),
      (2L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]),
      (3L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(2L)),
      (4L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[java.lang.Long]))
      .toDF("id", "mgr", "mentor"))
    g.addForeignKey("emp", "mgr", "emp", "id", g.Cascade)
    g.addForeignKey("emp", "mentor", "emp", "id", g.Cascade)
    g.delete("emp", col("id") === 1L)
    // closure: 1 → 2 (mgr edge) → 3 (mentor edge); 4 survives
    assert(g.table("emp").select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("CASCADE preserves the child table's column order") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id", g.Cascade)
    g.insert("child", Seq((10L, 1L), (11L, 2L)).toDF("id", "pid"))
    g.delete("parent", col("id") === 1L)
    // the USING semi/anti joins move the FK column first internally; the
    // persisted schema must still be (id, pid)
    assert(g.table("child").columns.toSeq == Seq("id", "pid"))
    assert(g.table("child").as[(Long, Long)].collect().toSeq == Seq((11L, 2L)))
  }

  test("FK CASCADE cycle across two tables fails fast, not FileNotFound") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("a", StructType(Seq(
      StructField("id", LongType), StructField("bref", LongType))))
    g.createTable("b", StructType(Seq(
      StructField("id", LongType), StructField("aref", LongType))))
    g.insert("a", Seq((1L, 1L)).toDF("id", "bref"))
    g.insert("b", Seq((1L, 1L)).toDF("id", "aref"))
    g.addForeignKey("a", "bref", "b", "id", g.Cascade)
    g.addForeignKey("b", "aref", "a", "id", g.Cascade)
    val e = intercept[IllegalArgumentException] {
      g.delete("a", col("id") === 1L)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("DELETE RETURNING stays lazy and survives the directory swap") {
    val g = GraftSession(spark, graft.TmpDirs.create("graft"))
    g.createTable("t", StructType(Seq(StructField("v", LongType))))
    g.insert("t", spark.range(1000).select(col("id").as("v")))
    val ret = g.delete("t", col("v") < 100)
    // the frame reads staged parquet written before the swap — consuming it
    // AFTER further DML must still work
    g.insert("t", Seq(5000L).toDF("v"))
    assert(ret.count() == 100)
    assert(ret.agg(org.apache.spark.sql.functions.min(col("v")))
      .head().getLong(0) == 0L)
  }

  test("FK SET NULL nulls child references on parent delete") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id", g.SetNull)
    g.insert("child", Seq((10L, 1L), (12L, 2L)).toDF("id", "pid"))
    g.delete("parent", col("id") === 1L)
    val rows = g.table("child").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rows.toSeq == Seq((10L, None), (12L, Some(2L))))
  }

  test("pruned DML keeps rename resolution for untouched batches") {
    import scala.jdk.CollectionConverters._
    val root = graft.TmpDirs.create("graft")
    val g = GraftSession(spark, root)
    g.createTable("rt", StructType(Seq(
      StructField("k", LongType), StructField("v", LongType))))
    g.insert("rt", Seq((1L, 10L), (2L, 20L)).toDF("k", "v")) // physical: v
    g.renameColumn("rt", "v", "w")
    g.insert("rt", Seq((3L, 30L), (4L, 40L)).toDF("k", "w")) // physical: w
    val dataDir = java.nio.file.Paths.get(root, "rt", "data")
    def dirs() = Files.list(dataDir).iterator.asScala
      .map(_.getFileName.toString).toSeq.sorted
    val before = dirs()
    // selective UPDATE matches only the post-rename batch; the
    // pre-rename batch dir must stay in place with its OLD physical
    // column name still resolving through the rename map
    g.update("rt", Map("w" -> lit(99L)), col("k") === 3L)
    assert(dirs().contains(before(0)), "pre-rename batch must be untouched")
    assert(!dirs().contains(before(1)))
    assert(g.table("rt").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (2L, 20L), (3L, 99L), (4L, 40L)))
    // and a selective update matching the PRE-rename batch rewrites it
    // to the new physical name without disturbing the other batches
    g.update("rt", Map("w" -> lit(11L)), col("k") === 1L)
    assert(g.table("rt").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 11L), (2L, 20L), (3L, 99L), (4L, 40L)))
  }

  test("selective UPDATE/DELETE rewrite only batches containing matches") {
    import scala.jdk.CollectionConverters._
    val root = graft.TmpDirs.create("graft")
    val g = GraftSession(spark, root)
    g.createTable("pt", StructType(Seq(
      StructField("k", LongType), StructField("v", LongType))))
    g.insert("pt", Seq((1L, 10L), (2L, 20L)).toDF("k", "v")) // batch 0
    g.insert("pt", Seq((3L, 30L), (4L, 40L)).toDF("k", "v")) // batch 1
    g.insert("pt", Seq((5L, 50L), (6L, 60L)).toDF("k", "v")) // batch 2
    val dataDir = java.nio.file.Paths.get(root, "pt", "data")
    def dirs() = Files.list(dataDir).iterator.asScala
      .map(_.getFileName.toString).toSeq.sorted
    // full byte fingerprint of every file under a batch dir
    def fp(d: String) = Files.walk(dataDir.resolve(d)).iterator.asScala
      .filter(Files.isRegularFile(_)).toSeq.sortBy(_.toString)
      .map(p => (p.toString,
        java.util.Arrays.hashCode(Files.readAllBytes(p)), Files.size(p)))
    val before = dirs()
    assert(before.size == 3)
    val (fp0, fp2) = (fp(before(0)), fp(before(2)))

    // UPDATE touching only batch 1: batches 0 and 2 stay byte-identical
    val ret = g.update("pt", Map("v" -> lit(99L)), col("k") === 3L)
    assert(ret.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((3L, 99L)))
    val after = dirs()
    assert(!after.contains(before(1)), "matched batch must be replaced")
    assert(after.contains(before(0)) && after.contains(before(2)))
    assert(fp(before(0)) == fp0 && fp(before(2)) == fp2,
      "unmatched batch dirs must be byte-identical after a selective UPDATE")
    assert(g.table("pt").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      == Seq((1L, 10L), (2L, 20L), (3L, 99L), (4L, 40L), (5L, 50L), (6L, 60L)))

    // DELETE touching only the batch holding k=5: batch 0 still untouched
    g.delete("pt", col("k") === 5L)
    assert(dirs().contains(before(0)) && fp(before(0)) == fp0,
      "unmatched batch dirs must be byte-identical after a selective DELETE")
    assert(g.table("pt").orderBy("k").select("k").collect().map(_.getLong(0))
      .toSeq == Seq(1L, 2L, 3L, 4L, 6L))

    // WHERE matching nothing: every batch dir survives untouched
    val preNoop = dirs()
    g.delete("pt", col("k") === 999L)
    assert(dirs() == preNoop)

    // UPDATE ... FROM (join form) touching only the batch holding k=6
    val src = Seq((6L, 1000L)).toDF("k_src", "newv")
    val fpB = fp(before(0))
    g.updateFrom("pt", src, col("pt.k") === col("k_src"),
      Map("v" -> col("newv")))
    assert(dirs().contains(before(0)) && fp(before(0)) == fpB,
      "unmatched batch dirs must be byte-identical after UPDATE...FROM")
    assert(g.table("pt").filter(col("k") === 6L).select("v")
      .collect().head.getLong(0) == 1000L)

    // type-evolving SET falls back to the full rewrite and stays correct
    g.update("pt", Map("v" -> (col("v") + lit(0.5))), col("k") === 1L)
    val out = g.table("pt").orderBy("k").select("v")
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(10.5, 20.0, 99.0, 40.0, 1000.0))
  }
}
