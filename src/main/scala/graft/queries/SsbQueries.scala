package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Star-Schema-Benchmark flight shapes adapted to the driver's schema
  * (the reference vendors SSB's 13 queries — /root/reference
  * benchmark/ssb/, benchmark/SOURCES.md — grouped in 4 flights; ALL 13
  * flights are represented: sb1–sb4 are the flight leads, sb5–sb13 the
  * remaining variants. lineorder ≈ lineitem⋈orders, the date dim ≈ date
  * parts of o_orderdate/l_shipdate spelled as PUSHABLE timestamp ranges
  * — year/yearmonth/week equality predicates never reach a parquet scan
  * — and SSB's c_city/s_city (the generator derives city = nation
  * prefix + digit 0..9) ≈ the same derivation here,
  * `n_name || '_' || key % 10`.)
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
        // year(l_shipdate)=1997 spelled as the equivalent pushable
        // timestamp range: year()/month() never reach PushedFilters, a
        // bare range prunes row groups (repo convention; PlanGuardSpec
        // pins the band alongside sb5/sb6).
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
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
    }),

    // SSB Q1.2 (ref q1-2.sql): the yearmonth drill of flight 1 —
    // d_yearmonthnum = 199703 spelled as the pushable one-month
    // timestamp range, tighter discount/quantity bands. Zero joins, one
    // pushed-filter scan into a 1-row ungrouped aggregate.
    "sb5_month_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .filter(col("l_discount").between(0.04, 0.06))
        .filter(col("l_quantity").between(26, 35))
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // SSB Q1.3 (ref q1-3.sql): the week drill — d_weeknuminyear + d_year
    // as a pushable two-week range (ISO weeks 6–7 of 1997; one synthetic
    // week is empty at the sf0.001 smoke scale, so the flight keeps the
    // reference's week granularity ×2).
    "sb6_week_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-02-03").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-02-17").cast("timestamp"))
        .filter(col("l_discount").between(0.04, 0.08))
        .filter(col("l_quantity").between(20, 40))
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // SSB Q2.2 (ref q2-2.sql): flight 2 with a brand RANGE predicate
    // (p_brand1 BETWEEN ... — a sargable string range the scan pushes)
    // instead of sb2's category equality.
    "sb7_brand_range" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand").between("Brand#21", "Brand#24"))
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

    // SSB Q2.3 (ref q2-3.sql): flight 2 drilled to a SINGLE brand in one
    // region — the most selective flight-2 variant, where the part build
    // side shrinks to ~1/25 of the dim and AQE broadcasts it.
    "sb8_single_brand" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#22")
      val sup = t(s, dir, "supplier")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE"))
      val l = t(s, dir, "lineitem")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(year(col("l_shipdate")).as("l_year"), col("p_brand"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("l_year"), col("p_brand"))
    }),

    // SSB Q3.2 (ref q3-2.sql): flight 3 drilled from region to a single
    // NATION on both sides, grouped by the finer city grain (SSB's city
    // is generator-derived nation+digit; same derivation here).
    "sb9_city_drill" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n1 = broadcast(t(s, dir, "nation")
        .filter(col("n_name") === "NATION_19")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("c_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .filter(col("n_name") === "NATION_19")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation")))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n1, c("c_nationkey") === n1("c_nk"))
        .join(n2, sup("s_nationkey") === n2("s_nk"))
        .groupBy(
          concat(col("c_nation"), lit("_"),
            (col("c_custkey") % 10).cast("string")).as("c_city"),
          concat(col("s_nation"), lit("_"),
            (col("s_suppkey") % 10).cast("string")).as("s_city"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("l_year"), col("revenue").desc,
          col("c_city"), col("s_city"))
    }),

    // SSB Q3.3 (ref q3-3.sql): flight 3 drilled to an OR-of-two-cities
    // on BOTH sides — a disjunctive dim predicate on a derived column
    // (applied scan-side on each dim after its broadcast nation join).
    "sb10_city_pair" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val c = t(s, dir, "customer")
        .join(broadcast(nat.select(col("n_nationkey").as("c_nk"),
          col("n_name").as("c_nation"))), col("c_nationkey") === col("c_nk"))
        .withColumn("c_city", concat(col("c_nation"), lit("_"),
          (col("c_custkey") % 10).cast("string")))
        .filter(col("c_city").isin("NATION_3_7", "NATION_11_3"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat.select(col("n_nationkey").as("s_nk"),
          col("n_name").as("s_nation"))), col("s_nationkey") === col("s_nk"))
        .withColumn("s_city", concat(col("s_nation"), lit("_"),
          (col("s_suppkey") % 10).cast("string")))
        .filter(col("s_city").isin("NATION_19_1", "NATION_20_4"))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("2001-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("c_city"), col("s_city"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("l_year"), col("revenue").desc,
          col("c_city"), col("s_city"))
    }),

    // SSB Q3.4 (ref q3-4.sql): the single-MONTH drill of flight 3
    // (d_yearmonth = 'Dec1997' ≈ the pushable January-1997 range here)
    // with OR-of-two dim values on both sides.
    "sb11_city_month" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n1 = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_3", "NATION_11"))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("c_nation")))
      val n2 = broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_19", "NATION_20"))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation")))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-02-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(n1, c("c_nationkey") === n1("c_nk"))
        .join(n2, sup("s_nationkey") === n2("s_nk"))
        .groupBy(col("c_nation"), col("s_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("l_year"), col("revenue").desc,
          col("c_nation"), col("s_nation"))
    }),

    // SSB Q4.2 (ref q4-2.sql): flight 4 drilled to a two-year band with
    // a part-attribute OR, grouped by (year, s_nation, p_type) — the
    // full 5-table star with every dim filtered.
    "sb12_profit_drill" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      val c = t(s, dir, "customer")
        .join(broadcast(nat.select(col("n_nationkey").as("c_nk"),
          col("n_regionkey").as("c_rk"))), col("c_nationkey") === col("c_nk"))
        .join(broadcast(reg.filter(col("r_name") === "AMERICA")
          .select(col("r_regionkey").as("c_rrk"))), col("c_rk") === col("c_rrk"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat.select(col("n_nationkey").as("s_nk"),
          col("n_name").as("s_nation"), col("n_regionkey").as("s_rk"))),
          col("s_nationkey") === col("s_nk"))
        .join(broadcast(reg.filter(col("r_name") === "AMERICA")
          .select(col("r_regionkey").as("s_rrk"))), col("s_rk") === col("s_rrk"))
      val p = t(s, dir, "part")
        .filter(col("p_type") === "SMALL" || col("p_type") === "MEDIUM")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"),
          col("s_nation"), col("p_type"))
        .agg(dsum(rev - lit(0.6) * col("l_extendedprice")).as("profit"))
        .orderBy(col("o_year"), col("s_nation"), col("p_type"))
    }),

    // SSB Q4.3 (ref q4-3.sql): the deepest flight-4 drill — supplier
    // fixed to ONE nation, part to one type, grouped by the city grain.
    "sb13_profit_city" -> ((s, dir) => {
      val nat = t(s, dir, "nation")
      val reg = t(s, dir, "region")
      val c = t(s, dir, "customer")
        .join(broadcast(nat.select(col("n_nationkey").as("c_nk"),
          col("n_regionkey").as("c_rk"))), col("c_nationkey") === col("c_nk"))
        .join(broadcast(reg.filter(col("r_name") === "AMERICA")
          .select(col("r_regionkey").as("c_rrk"))), col("c_rk") === col("c_rrk"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat.filter(col("n_name") === "NATION_20")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("s_nation"))),
          col("s_nationkey") === col("s_nk"))
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"),
          concat(col("s_nation"), lit("_"),
            (col("s_suppkey") % 10).cast("string")).as("s_city"),
          col("p_brand"))
        .agg(dsum(rev - lit(0.6) * col("l_extendedprice")).as("profit"))
        .orderBy(col("o_year"), col("s_city"), col("p_brand"))
    })
  )

  val oracles: Map[String, String] = Map(
    "sb1_discount_revenue" -> """
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
          AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
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
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "sb5_month_revenue" -> """
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
          AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
        AND l_discount BETWEEN 0.04 AND 0.06
        AND l_quantity BETWEEN 26 AND 35""",
    "sb6_week_revenue" -> """
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
          AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-02-03'
        AND l_shipdate < TIMESTAMP '1997-02-17'
        AND l_discount BETWEEN 0.04 AND 0.08
        AND l_quantity BETWEEN 20 AND 40""",
    "sb7_brand_range" -> """
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year, p_brand,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_brand BETWEEN 'Brand#21' AND 'Brand#24' AND r_name = 'ASIA'
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "sb8_single_brand" -> """
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year, p_brand,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE p_brand = 'Brand#22' AND r_name = 'EUROPE'
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "sb9_city_drill" -> """
      SELECT
        cn.n_name || '_' || CAST(c_custkey % 10 AS VARCHAR) AS c_city,
        sn.n_name || '_' || CAST(s_suppkey % 10 AS VARCHAR) AS s_city,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name = 'NATION_19' AND sn.n_name = 'NATION_19'
      GROUP BY 1, 2, 3
      ORDER BY l_year, revenue DESC, c_city, s_city""",
    "sb10_city_pair" -> """
      SELECT
        cn.n_name || '_' || CAST(c_custkey % 10 AS VARCHAR) AS c_city,
        sn.n_name || '_' || CAST(s_suppkey % 10 AS VARCHAR) AS s_city,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name || '_' || CAST(c_custkey % 10 AS VARCHAR)
              IN ('NATION_3_7', 'NATION_11_3')
        AND sn.n_name || '_' || CAST(s_suppkey % 10 AS VARCHAR)
              IN ('NATION_19_1', 'NATION_20_4')
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '2001-01-01'
      GROUP BY 1, 2, 3
      ORDER BY l_year, revenue DESC, c_city, s_city""",
    "sb11_city_month" -> """
      SELECT cn.n_name AS c_nation, sn.n_name AS s_nation,
        CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cn.n_name IN ('NATION_3', 'NATION_11')
        AND sn.n_name IN ('NATION_19', 'NATION_20')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-02-01'
      GROUP BY 1, 2, 3
      ORDER BY l_year, revenue DESC, c_nation, s_nation""",
    "sb12_profit_drill" -> """
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        sn.n_name AS s_nation, p_type,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          - 0.6 * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS profit
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN region sr ON sn.n_regionkey = sr.r_regionkey
      WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
        AND (p_type = 'SMALL' OR p_type = 'MEDIUM')
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "sb13_profit_city" -> """
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        sn.n_name || '_' || CAST(s_suppkey % 10 AS VARCHAR) AS s_city,
        p_brand,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          - 0.6 * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS profit
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN part ON l_partkey = p_partkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE cr.r_name = 'AMERICA' AND sn.n_name = 'NATION_20'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
        AND p_type = 'ECONOMY'
      GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")
}
