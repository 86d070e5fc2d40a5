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
    val g = GraftSession(spark, Files.createTempDirectory("graft").toString)
    g.createTable("parent", StructType(Seq(StructField("id", LongType))))
    g.createTable("child", StructType(Seq(
      StructField("id", LongType), StructField("pid", LongType))))
    g.insert("parent", Seq(1L, 2L, 3L).toDF("id"))
    g
  }

  test("CHECK constraint rejects violating inserts") {
    val g = GraftSession(spark, Files.createTempDirectory("graft").toString)
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

  test("FK CASCADE deletes children with the parent") {
    val g = sessionWithParentChild()
    g.addForeignKey("child", "pid", "parent", "id", g.Cascade)
    g.insert("child", Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("id", "pid"))
    g.delete("parent", col("id") === 1L)
    assert(g.table("child").select("id").as[Long].collect().sorted.toSeq
      == Seq(12L))
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
}
