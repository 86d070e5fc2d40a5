package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.GraftSession

/** Runnable tour of the session surface: catalog + dynamic schema + DML +
  * constraints + PG-dialect SQL. `sbt "runMain graft.examples.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        graft.TmpDirs.create("wh"))
      .withExtensions(new graft.plans.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val g = GraftSession(spark,
      graft.TmpDirs.create("graft_demo"))

    // fixed tables + constraints
    g.createTable("parent", StructType(Seq(StructField("id", LongType))))
    g.createTable("child", StructType(Seq(
      StructField("id", LongType), StructField("pid", LongType))))
    g.addCheckConstraint("child", "pos_id", "id > 0")
    g.addForeignKey("child", "pid", "parent", "id", g.Cascade)
    g.insert("parent", Seq(1L, 2L).toDF("id"))
    g.insert("child", Seq((10L, 1L), (11L, 2L)).toDF("id", "pid"))
    try g.insert("child", Seq((-1L, 1L)).toDF("id", "pid"))
    catch { case e: IllegalStateException =>
      println(s"CHECK rejected: ${e.getMessage}") }
    try g.insert("child", Seq((12L, 99L)).toDF("id", "pid"))
    catch { case e: IllegalStateException =>
      println(s"FK rejected: ${e.getMessage}") }
    g.delete("parent", col("id") === 1L)
    println("child ids after cascade: " +
      g.table("child").select("id").as[Long].collect().toList)

    // dynamic table + jsonb SQL
    g.createDynamicTable("docs")
    g.insert("docs", Seq(("a", """{"k": 1}""")).toDF("_id", "props"))
    g.insert("docs", Seq(("b", """{"k": 2}""", 7L)).toDF("_id", "props", "extra"))
    println("dynamic schema: " + g.table("docs").schema.toDDL)
    g.sql("SELECT _id, props->>'k' AS k FROM docs ORDER BY _id").show()

    // textual execute_sql entry point (DDL + DML + query routing)
    g.execute("CREATE TABLE items (id BIGINT, qty BIGINT)")
    g.execute("INSERT INTO items (id, qty) VALUES (1, 10), (2, 20)")
    g.execute("UPDATE items SET qty = qty * 2 WHERE id = 2")
    println("items total qty: " + g.execute(
      "SELECT sum(qty) AS s FROM items").collect()(0).getLong(0))

    // multi-format ingest round-trip
    val tmp = graft.TmpDirs.create("ingest")
    val sample = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    graft.sources.Ingest.writeJson(sample, s"$tmp/j")
    graft.sources.Ingest.writeOrc(sample, s"$tmp/o")
    println("json rows: " + graft.sources.Ingest.readJson(spark, s"$tmp/j").count()
      + ", orc rows: " + graft.sources.Ingest.readOrc(spark, s"$tmp/o").count())

    // bucketed co-located join: zero shuffle exchanges
    val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"n$i")).toDF("k", "name")
    graft.sources.Bucketing.writeBucketed(facts, "bf", "k", 4)
    graft.sources.Bucketing.writeBucketed(dims, "bd", "k", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joinPlan = graft.sources.Bucketing
      .colocatedJoin(spark, "bf", "bd", "k")
      .queryExecution.executedPlan.toString
    println("bucketed join shuffle-free: " +
      !joinPlan.contains("Exchange hashpartitioning"))

    // catalog introspection (pg_class relkind vocabulary)
    g.execute("SHOW TABLES").show()
    g.execute("DESCRIBE items").show()

    // MERGE INTO: conditional update + insert arms in one statement
    g.execute("CREATE TABLE merge_src (sid BIGINT, delta BIGINT)")
    g.execute("INSERT INTO merge_src VALUES (2, 5), (7, 70)")
    g.execute("""
      MERGE INTO items USING merge_src ON items.id = merge_src.sid
      WHEN MATCHED THEN UPDATE SET qty = qty + delta
      WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (sid, delta)
    """).show() // affected rows + merge_action (UPDATE / INSERT)

    // self-describing Arrow IPC stream (schema travels in-band; readable
    // by any stock Arrow consumer, e.g. pyarrow.ipc.open_stream)
    val stream = org.apache.spark.sql.graftarrow.ArrowBridge
      .toArrowStream(g.table("items"))
    val parsed = org.apache.spark.sql.graftarrow.ArrowBridge
      .fromArrowStream(spark, stream)
    println(s"arrow stream: ${stream.length} bytes -> " +
      s"${parsed.count()} rows, schema ${parsed.schema.simpleString}")

    // WITH RECURSIVE through the SQL surface
    g.sql("""
      WITH RECURSIVE t(n) AS (
        SELECT CAST(1 AS BIGINT) AS n
        UNION ALL
        SELECT n + 1 AS n FROM t WHERE n < 5)
      SELECT sum(n) AS s FROM t""").show()

    // size-tiered maintenance: fold the small-batch tail only
    g.compactSmall("items")

    // COPY export/import through the router (PG/DuckDB idiom)
    val copyDir = graft.TmpDirs.createPath("demo_copy")
    g.execute(s"COPY items TO '$copyDir/items_out' (FORMAT parquet)").show()
    g.execute("CREATE TABLE items_back (id BIGINT, qty BIGINT)")
    g.execute(s"COPY items_back FROM '$copyDir/items_out'")
    g.execute("SELECT count(*) AS copied FROM items_back").show()

    // incremental matview: refresh folds only appended batches
    g.execute("""CREATE INCREMENTAL MATERIALIZED VIEW item_stats AS
      SELECT qty, count(*) AS n, sum(id) AS ids
      FROM items GROUP BY qty""")
    g.execute("INSERT INTO items (id, qty) VALUES (100, 9)")
    println("refresh mode: " + g.refreshIncrementalMatView("item_stats"))
    g.execute("SELECT * FROM item_stats ORDER BY qty").show(5)
    // ... and stays incremental across compaction (fold-logged rewrite)
    g.execute("INSERT INTO items (id, qty) VALUES (101, 9)")
    g.compactSmall("items", smallBytes = Long.MaxValue)
    println("refresh after compact: " +
      g.refreshIncrementalMatView("item_stats"))

    // exactly-once streaming landing: replays of the same (query, epoch)
    // are no-ops, distinct queries sharing the table both land
    import spark.implicits._
    g.execute("CREATE TABLE landed (id BIGINT)")
    println("first land: " +
      g.insertIfNew("landed", 0L, Seq(1L, 2L).toDF("id"), "stream-a"))
    println("replay land: " +
      g.insertIfNew("landed", 0L, Seq(1L, 2L).toDF("id"), "stream-a"))
    println("other query: " +
      g.insertIfNew("landed", 0L, Seq(3L).toDF("id"), "stream-b"))
    g.execute("SELECT count(*) AS landed_rows FROM landed").show()

    // EXPLAIN through the router (plan rows for DB-API consumers)
    g.execute("EXPLAIN SELECT qty, count(*) AS n FROM items GROUP BY qty")
      .show(8, truncate = false)

    // composite index = Z-order layout: after CHECKPOINT, parquet
    // min/max stats skip row groups on EITHER of (x, y)
    g.execute("CREATE TABLE points (x BIGINT, y BIGINT)")
    g.execute("CREATE INDEX points_xy ON points (x, y)")
    g.insert("points", (0L until 1000L).map(i => (i, 999L - i))
      .toDF("x", "y"))
    g.execute("CHECKPOINT points")
    g.execute("SELECT count(*) AS in_box FROM points " +
      "WHERE x BETWEEN 10 AND 20 AND y BETWEEN 979 AND 989").show()

    // incremental COUNT(DISTINCT): the stored column is a mergeable HLL
    // sketch; deltas union in, readers estimate
    g.execute("CREATE INCREMENTAL MATERIALIZED VIEW item_users AS " +
      "SELECT qty, approx_distinct(id) AS nd FROM items GROUP BY qty")
    g.execute("INSERT INTO items (id, qty) VALUES (100, 9), (500, 9)")
    println("hll refresh: " + g.refreshIncrementalMatView("item_users"))
    g.execute("SELECT qty, hll_sketch_estimate(nd) AS users " +
      "FROM item_users ORDER BY qty").show(5)

    // BM25 inverted index: build once (term-sorted postings + df + corpus
    // stats), query many — the query-term predicate pushes into the
    // postings parquet scan, so retrieval I/O tracks matches, not corpus
    val corpus = Seq(
      (1L, "spark shuffles the hash join build side"),
      (2L, "broadcast joins skip the shuffle"),
      (3L, "window functions rank rows per partition"),
      (4L, "the hash aggregate spills to disk"))
      .toDF("doc_id", "text")
    val idxDir = s"$tmp/bm25"
    graft.operators.Retrieval.buildBm25Index(corpus, "text", "doc_id", idxDir)
    val hits = graft.operators.Retrieval.queryBm25Index(spark, idxDir,
      Seq("q_hash" -> Seq("hash", "join"), "q_win" -> Seq("window")), k = 2)
    hits.show(6, truncate = false)
    println("postings scan pushes query terms: " +
      hits.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("PushedFilters: [In(term"))
        .take(1).mkString.trim.take(120))

    // session niceties
    g.setTimezone("UTC")
    println(g.explainPlan(
      "SELECT pid, count(*) AS n FROM child GROUP BY pid")
      .linesIterator.take(10).mkString("\n"))
    spark.stop()
  }
}
