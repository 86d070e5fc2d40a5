package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.api.GraftSession

/** Incremental aggregate matviews: refresh folds only appended batches
  * (O(delta)); rewritten history falls back to a full rebuild. */
class IncMatViewSpec extends SparkSpec {
  import spark.implicits._

  private def g = GraftSession(spark,
    Files.createTempDirectory("graft_inc").toString)

  private def docs(s: GraftSession): Seq[(String, Long, Long)] =
    s.table("mv").orderBy(col("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("incremental refresh folds only new batches and matches full agg") {
    val s = g
    s.execute("CREATE TABLE base (lang STRING, n_chars BIGINT)")
    s.execute("INSERT INTO base VALUES ('en', 10), ('en', 20), ('de', 5)")
    s.createIncrementalMatView("mv", "base", Seq("lang"),
      Seq(("count", "*", "n"), ("sum", "n_chars", "chars")))
    assert(docs(s) == Seq(("de", 1L, 5L), ("en", 2L, 30L)))

    // no new batches → noop
    assert(s.refreshIncrementalMatView("mv") == "noop")

    // two appends → exactly 2 delta batches folded
    s.execute("INSERT INTO base VALUES ('en', 1), ('fr', 7)")
    s.execute("INSERT INTO base VALUES ('de', 2)")
    assert(s.refreshIncrementalMatView("mv") == "incremental(2)")
    assert(docs(s) ==
      Seq(("de", 2L, 7L), ("en", 3L, 31L), ("fr", 1L, 7L)))
  }

  test("min/max merge correctly across delta refreshes") {
    val s = g
    s.execute("CREATE TABLE base (lang STRING, n_chars BIGINT)")
    s.execute("INSERT INTO base VALUES ('en', 10), ('en', 20)")
    s.createIncrementalMatView("mv2", "base", Seq("lang"),
      Seq(("min", "n_chars", "mn"), ("max", "n_chars", "mx")))
    s.execute("INSERT INTO base VALUES ('en', 3), ('en', 99)")
    assert(s.refreshIncrementalMatView("mv2").startsWith("incremental"))
    val r = s.table("mv2").collect().head
    assert((r.getLong(1), r.getLong(2)) == (3L, 99L))
  }

  test("rewritten history (UPDATE) falls back to a full rebuild") {
    val s = g
    s.execute("CREATE TABLE base (lang STRING, n_chars BIGINT)")
    s.execute("INSERT INTO base VALUES ('en', 10), ('de', 5)")
    s.createIncrementalMatView("mv", "base", Seq("lang"),
      Seq(("count", "*", "n"), ("sum", "n_chars", "chars")))
    s.execute("UPDATE base SET n_chars = n_chars + 100 WHERE lang = 'en'")
    assert(s.refreshIncrementalMatView("mv") == "full")
    assert(docs(s) == Seq(("de", 1L, 5L), ("en", 1L, 110L)))
  }

  test("SQL surface: CREATE INCREMENTAL MATERIALIZED VIEW + REFRESH") {
    val s = g
    s.execute("CREATE TABLE base (lang STRING, n_chars BIGINT)")
    s.execute("INSERT INTO base VALUES ('en', 10), ('en', 20), ('de', 5)")
    s.execute("""CREATE INCREMENTAL MATERIALIZED VIEW mv AS
      SELECT lang, count(*) AS n, sum(n_chars) AS chars
      FROM base GROUP BY lang""")
    s.execute("INSERT INTO base VALUES ('fr', 7)")
    s.execute("REFRESH MATERIALIZED VIEW mv")
    val rows = s.execute("SELECT lang, n, chars FROM mv ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq ==
      Seq(("de", 1L, 5L), ("en", 2L, 30L), ("fr", 1L, 7L)))

    intercept[IllegalArgumentException] {
      s.execute("""CREATE INCREMENTAL MATERIALIZED VIEW bad AS
        SELECT lang, avg(n_chars) AS a FROM base GROUP BY lang""")
    }
  }

  test("non-algebraic aggregate is rejected with a clear error") {
    val s = g
    s.execute("CREATE TABLE base (lang STRING, n_chars BIGINT)")
    s.execute("INSERT INTO base VALUES ('en', 1)")
    val e = intercept[IllegalArgumentException] {
      s.createIncrementalMatView("mv", "base", Seq("lang"),
        Seq(("avg", "n_chars", "a")))
    }
    assert(e.getMessage.contains("avg"))
  }
}
