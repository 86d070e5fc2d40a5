package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Star-Schema-Benchmark flight shapes adapted to the driver's schema
  * (the reference vendors SSB's 13 queries — /root/reference
  * benchmark/ssb/, benchmark/SOURCES.md — grouped in 4 flights; one
  * representative per flight here, lineorder ≈ lineitem⋈orders and the
  * date dim ≈ date parts of o_orderdate/l_shipdate).
  *
  * Scale shape shared by all four: the fact table is scanned once with
  * pushed date/measure filters and the single planned exchange is the
  * partial+final aggregation on the (small) grouping key — the canonical
  * star-join plan at 100 TB. Only nation/region (25/5 rows by spec) carry
  * broadcast hints; customer/supplier/part are scale-proportional, so
  * AQE's size check decides broadcast-vs-shuffle for them (a forced hint
  * would OOM at 100x — see GraftSession's FK-path rationale).
  */
object SsbQueries {
  private val D = DecimalType(28, 6)
  private def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private def rev: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flight 1: date+measure-filtered revenue scan (SSB Q1.x)
    "sb1_discount_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .filter(col("l_discount").between(0.02, 0.04))
        .filter(col("l_quantity") < 25)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Flight 2: revenue by (year, brand) with part-type + supplier-region
    // dims (SSB Q2.x)
    "sb2_brand_revenue" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "SMALL")
      val sup = t(s, dir, "supplier")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      val l = t(s, dir, "lineitem")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(year(col("l_shipdate")).as("l_year"), col("p_brand"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("l_year"), col("p_brand"))
    }),

    // Flight 3: revenue by (cust nation, supp nation, year) within a
    // region (SSB Q3.x)
    "sb3_nation_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("c_nation"),
          col("n_regionkey").as("c_rk")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation"),
          col("n_regionkey").as("s_rk")))
      val r = broadcast(t(s, dir, "region")
        .filter(col("r_name") === "EUROPE"))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") <= lit("1997-12-31").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n1, c("c_nationkey") === n1("c_nk"))
        .join(n2, sup("s_nationkey") === n2("s_nk"))
        .join(r, n1("c_rk") === r("r_regionkey") &&
          n2("s_rk") === r("r_regionkey"))
        .groupBy(col("c_nation"), col("s_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("l_year"), col("revenue").desc,
          col("c_nation"), col("s_nation"))
    }),

    // Flight 4: profit (revenue − modeled cost) by (year, cust region)
    // (SSB Q4.x; no supplycost column — cost modeled as 60% of list)
    "sb4_profit" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"),
          col("r_name").as("c_region"))
        .agg(dsum(rev - lit(0.6) * col("l_extendedprice")).as("profit"))
        .orderBy(col("o_year"), col("c_region"))
    })
  )

  val oracles: Map[String, String] = Map(
    "sb1_discount_revenue" -> """
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
          AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) = 1997
        AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 25""",
    "sb2_brand_revenue" -> """
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year, p_brand,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_type = 'SMALL' AND r_name = 'ASIA'
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "sb3_nation_revenue" -> """
      SELECT n1.n_name AS c_nation, n2.n_name AS s_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
          AND n2.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
      GROUP BY 1, 2, 3 ORDER BY l_year, revenue DESC, c_nation, s_nation""",
    "sb4_profit" -> """
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        r_name AS c_region,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          - 0.6 * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS profit
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2""")
}
