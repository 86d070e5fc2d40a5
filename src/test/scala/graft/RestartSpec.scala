package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.api.GraftSession

/** Catalog durability: a NEW GraftSession over the same root directory
  * sees everything the old one persisted — tables (schema + data),
  * views, matviews, sequences, constraints metadata, and incremental
  * matview specs (refresh stays incremental across restarts). The
  * reference keeps this in its disk catalog + WAL; here the contract is
  * directory layout + metadata files, no in-memory state required. */
class RestartSpec extends SparkSpec {
  import spark.implicits._

  test("tables, views, sequences and inc matviews survive a restart") {
    val root = graft.TmpDirs.create("graft_restart")
    val s1 = GraftSession(spark, root)
    s1.execute("CREATE TABLE t (id BIGINT, lang STRING)")
    s1.execute("INSERT INTO t VALUES (1, 'en'), (2, 'de'), (3, 'en')")
    s1.execute("CREATE VIEW v AS SELECT lang, count(*) AS n FROM t GROUP BY lang")
    s1.execute("CREATE SEQUENCE sq START 10")
    s1.execute("""CREATE INCREMENTAL MATERIALIZED VIEW mv AS
      SELECT lang, count(*) AS n, sum(id) AS ids FROM t GROUP BY lang""")

    // fresh session object, same root — nothing shared in memory
    val s2 = GraftSession(spark, root)
    assert(s2.execute("SELECT count(*) AS n FROM t").as[Long].head() == 3)
    assert(s2.execute("SELECT n FROM v WHERE lang = 'en'")
      .as[Long].head() == 2)
    // sequence resumes after the last issued value
    assert(s2.execute("INSERT INTO t VALUES (nextval('sq'), 'fr')")
      .count() == 0)
    assert(s2.execute("SELECT max(id) AS m FROM t").as[Long].head() == 10)

    // incremental matview: spec reloads from disk, refresh stays O(delta)
    s2.execute("INSERT INTO t VALUES (50, 'de')")
    assert(s2.refreshIncrementalMatView("mv").startsWith("incremental"))
    val rows = s2.execute("SELECT lang, n, ids FROM mv ORDER BY lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.contains(("de", 2L, 52L)))
  }
}
