package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Ingest

/** SQL-semantics regression pins mirroring the reference's e2e cases by
  * name (integration/cpp/test/test_sql_features.cpp: is_null, in_list,
  * between, like, distinct, count_distinct, having, coalesce, case_when,
  * datetime, decimal_type, comma_join; test_subqueries.cpp:
  * union_complex_types) plus the dialect deltas SURVEY §7 told us to pin
  * (division-by-zero, null sort order, 1-based substring). */
class SemanticsSpec extends SparkSpec {
  import spark.implicits._

  // the reference's TestCollection fixture: (name STRING, value BIGINT)
  private lazy val tc = Seq(
    ("alpha", Some(10L)), ("beta", Some(20L)), ("gamma", None),
    ("delta", Some(20L)), ("epsilon", Some(50L)))
    .toDF("name", "value")

  test("is_null") {
    assert(tc.filter(col("value").isNull).select("name").as[String]
      .collect().toSeq == Seq("gamma"))
    assert(tc.filter(col("value").isNotNull).count() == 4)
  }

  test("in_list") {
    assert(tc.filter(col("value").isin(10L, 50L)).count() == 2)
    // NULL never matches IN
    assert(tc.filter(col("value").isin(10L, 50L) ||
      col("value").isNull).count() == 3)
  }

  test("between") {
    assert(tc.filter(col("value").between(10, 20)).count() == 3)
  }

  test("like") {
    assert(tc.filter(col("name").like("%ta")).count() == 2) // beta, delta
    assert(tc.filter(col("name").like("_lpha")).count() == 1)
  }

  test("distinct and count_distinct") {
    assert(tc.select("value").distinct().count() == 4) // 10,20,50,NULL
    // COUNT(DISTINCT) ignores NULULLs — 3 distinct non-null values
    assert(tc.agg(countDistinct(col("value"))).as[Long].head() == 3)
  }

  test("having") {
    val out = tc.groupBy("value").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).collect()
    assert(out.length == 1 && out.head.getLong(0) == 20L)
  }

  test("coalesce and case_when") {
    val out = tc.select(coalesce(col("value"), lit(-1L)).as("v"),
      when(col("value") > 15, "big").when(col("value").isNotNull, "small")
        .otherwise("none").as("c"))
      .orderBy(col("name")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10, 20, 20, 50, -1))
    assert(out.map(_.getString(1)).toSeq ==
      Seq("small", "big", "big", "big", "none"))
  }

  test("case_when_in_aggregate") {
    val s = tc.agg(sum(when(col("value") >= 20, col("value"))
      .otherwise(lit(0L)))).as[Long].head()
    assert(s == 90L)
  }

  test("comma_join (cross join re-derives equi-join via WHERE)") {
    tc.createOrReplaceTempView("a")
    tc.createOrReplaceTempView("b")
    val n = spark.sql(
      "SELECT * FROM a, b WHERE a.value = b.value").count()
    // 10:1×1, 20:2×2, 50:1×1 (nulls never equal)
    assert(n == 6)
  }

  test("datetime compares and arithmetic") {
    val df = Seq("2024-03-01 10:00:00", "2024-03-02 10:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("t"))
    assert(df.filter(col("t") > lit("2024-03-01 12:00:00")).count() == 1)
    assert(df.select(date_add(col("t").cast("date"), 1)).as[java.sql.Date]
      .collect().map(_.toString).toSeq ==
      Seq("2024-03-02", "2024-03-03"))
  }

  test("decimal_type arithmetic is exact") {
    val df = Seq("0.1", "0.2").toDF("s")
      .select(col("s").cast(DecimalType(10, 2)).as("d"))
    assert(df.agg(sum(col("d"))).head().getDecimal(0)
      == new java.math.BigDecimal("0.30"))
  }

  test("union_complex_types (LIST/STRUCT shapes align by name)") {
    val a = Seq((1L, Seq(1, 2), ("x", 1))).toDF("id", "xs", "st")
    val b = Seq((2L, Seq(3), ("y", 2))).toDF("id", "xs", "st")
    val u = a.unionByName(b)
    assert(u.count() == 2)
    assert(u.select(explode(col("xs"))).count() == 3)
  }

  test("division by zero: ANSI errors like the PG-dialect reference") {
    assertThrows[Exception] {
      Seq((1, 0)).toDF("a", "b").select(col("a") / col("b")).collect()
    }
    // try_divide is the sanctioned null-on-zero escape hatch
    assert(Seq((1, 0)).toDF("a", "b")
      .select(try_divide(col("a"), col("b"))).head().isNullAt(0))
  }

  test("null sort order is explicit everywhere we order") {
    val vals = tc.orderBy(col("value").asc_nulls_last).select("value")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vals.last.isEmpty)
    val vals2 = tc.orderBy(col("value").asc_nulls_first).select("value")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(vals2.head.isEmpty)
  }

  test("substring is 1-based with saturating edges (PG-compatible)") {
    val df = Seq("abcdef").toDF("s")
    assert(df.select(substring(col("s"), 2, 3)).as[String].head() == "bcd")
    assert(df.select(substring(col("s"), 1, 100)).as[String].head() == "abcdef")
    assert(df.select(substring(col("s"), -2, 2)).as[String].head() == "ef")
  }

  test("fromRows builds a frame from explicit rows + schema") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tags", ArrayType(StringType))))
    val df = Ingest.fromRows(spark,
      Seq(Row(1L, Seq("a", "b")), Row(2L, null)), schema)
    assert(df.schema == schema)
    assert(df.count() == 2)
    assert(df.filter(col("tags").isNull).select("id").as[Long].head() == 2L)
  }

  test("ingest round-trips: json / csv / orc") {
    val dir = graft.TmpDirs.create("ingest")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    Ingest.writeJson(df, s"$dir/j"); Ingest.writeCsv(df, s"$dir/c")
    Ingest.writeOrc(df, s"$dir/o")
    assert(Ingest.readJson(spark, s"$dir/j").count() == 2)
    val csv = Ingest.readCsv(spark, s"$dir/c")
    assert(csv.count() == 2 && csv.columns.toSeq == Seq("id", "s", "v"))
    val orc = Ingest.readOrc(spark, s"$dir/o")
    // ORC round-trip preserves names/types (nullability widens to true)
    assert(orc.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(orc.count() == 2)
  }

  test("partitioned layout prunes directories at planning time") {
    val dir = graft.TmpDirs.create("ingest_part")
    val df = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    Ingest.writePartitioned(df, s"$dir/docs", Seq("lang"))
    // lang=… directories exist on disk
    val langDirs = Files.list(java.nio.file.Paths.get(dir, "docs"))
      .iterator()
    var nLang = 0
    while (langDirs.hasNext) {
      if (langDirs.next().getFileName.toString.startsWith("lang=")) nLang += 1
    }
    assert(nLang > 1, "expected one directory per lang value")
    val back = Ingest.readPartitioned(spark, s"$dir/docs")
    val pruned = back.filter(col("lang") === "en")
    // the partition filter reaches the scan as a PLANNING-time pruner —
    // not a post-scan data filter
    val scanText = pruned.queryExecution.executedPlan.toString
    assert(scanText.contains("PartitionFilters") &&
      scanText.contains("lang"), scanText.take(500))
    assert(pruned.count() ==
      df.filter(col("lang") === "en").count())
    // row content survives the round-trip (column order differs: the
    // partition column moves last)
    assert(back.count() == df.count())
  }
}
