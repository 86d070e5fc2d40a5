package graft

import java.nio.file.Files
import graft.api.GraftSession

/** execute_sql entry-point parity: DDL + DML + parameterized queries
  * through one textual entry (reference wrapper_dispatcher execute_sql /
  * execute_sql_with_params). */
class SqlRouterSpec extends SparkSpec {
  import spark.implicits._

  private def g = GraftSession(spark,
    Files.createTempDirectory("graft").toString)

  test("full SQL lifecycle: create, insert, update, delete, select") {
    val s = g
    s.execute("CREATE TABLE items (id BIGINT, name STRING, qty BIGINT)")
    s.execute("INSERT INTO items (id, name, qty) VALUES (1, 'a', 10), (2, 'b', 20)")
    s.execute("INSERT INTO items SELECT 3 AS id, 'c' AS name, 30 AS qty")
    assert(s.execute("SELECT count(*) AS n FROM items").as[Long].head() == 3)
    val updated = s.execute("UPDATE items SET qty = qty + 5 WHERE id >= 2")
    assert(updated.count() == 2) // RETURNING semantics
    assert(s.execute("SELECT sum(qty) AS s FROM items").as[Long].head()
      == 10 + 25 + 35)
    val deleted = s.execute("DELETE FROM items WHERE qty > 30")
    assert(deleted.count() == 1)
    assert(s.execute("SELECT count(*) AS n FROM items").as[Long].head() == 2)
    s.execute("DROP TABLE items")
    intercept[Exception] { s.execute("SELECT * FROM items").collect() }
  }

  test("CREATE TABLE without columns makes a dynamic table") {
    val s = g
    s.execute("CREATE TABLE docs")
    s.execute("INSERT INTO docs (_id, a) VALUES ('x', 1)")
    s.execute("INSERT INTO docs (_id, a, b) VALUES ('y', 2, 'two')")
    val out = s.execute("SELECT _id, a, b FROM docs ORDER BY _id")
    assert(out.columns.toSeq == Seq("_id", "a", "b"))
    assert(out.count() == 2)
  }

  test("SET TIMEZONE routes to the session config") {
    val s = g
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      s.execute("SET TIME ZONE 'America/New_York'")
      assert(spark.conf.get("spark.sql.session.timeZone")
        == "America/New_York")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("parameterized execute ($n binding)") {
    val s = g
    s.execute("CREATE TABLE t (v BIGINT)")
    s.execute("INSERT INTO t (v) VALUES (1), (5), (9)")
    assert(s.execute("SELECT count(*) AS n FROM t WHERE v > $1", Seq(4))
      .as[Long].head() == 2)
  }

  test("jsonb operators ride through execute") {
    val s = g
    s.execute("CREATE TABLE ev (id BIGINT, props STRING)")
    s.execute("""INSERT INTO ev (id, props) VALUES (1, '{"k": 42}')""")
    assert(s.execute("SELECT CAST(props->>'k' AS BIGINT) AS k FROM ev")
      .as[Long].head() == 42L)
  }
}
