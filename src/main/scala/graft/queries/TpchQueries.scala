package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-H-shaped multi-join analytics adapted to the driver's star schema
  * (the reference ships the TPC-H corpus as its primary benchmark —
  * /root/reference benchmark/tpch/q1..q22.sql; columns not present in the
  * synthetic tables are adapted, e.g. no partsupp/shipmode).
  *
  * These are the bench headliners: selective scans feeding dim joins into
  * partial+final aggregation — the plan shape that must hold at 100 TB.
  * Broadcast hints are deliberately NOT placed on scale-proportional
  * tables (customer/supplier/part grow with the scale factor — TPC-H
  * sf100 customer is ~15M rows): AQE's size-aware selection broadcasts
  * them while they fit under the threshold and degrades to a shuffled
  * join when they don't, whereas a forced hint would OOM the executors
  * at 100x. Hints remain only on frames bounded by construction:
  * nation (25 rows by spec), region (5 rows), and 1-row scalar
  * aggregates (h15's max, h22's avg threshold).
  */
object TpchQueries {
  private val D = DecimalType(28, 6)
  private def dsum(c: Column): Column = sum(c.cast(D)).cast("double")
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
  private def rev: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3 shipping priority: segment customers' unshipped orders by revenue
    "h3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Q5 local-supplier revenue by nation (full 6-table join)
    "h5_local_supplier" -> ((s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q6 forecast revenue change: pure scan+filter+agg
    "h6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .filter(col("l_discount").between(0.03, 0.07))
        .filter(col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // Q11's signature: per-group value filtered against a GLOBAL scalar
    // (q11 keeps parts whose stock value exceeds a fraction of the
    // nation's total; the driver schema has no partsupp, and q11's
    // fraction is SF-aware by spec, so the scale-invariant spelling is
    // "parts whose lineitem value exceeds 1.2x the mean part value").
    // The comparison is BIGINT micro-units on both sides —
    // v_mu*np*5 > tot_mu*6 is v > 1.2*tot/np with zero FP and zero
    // decimal-precision-cap rounding. Scale shape: the global is a
    // 1-ROW ungrouped aggregate — broadcast-safe BY CONSTRUCTION (the
    // plan guard's documented exemption), so the HAVING filter is a
    // map-side predicate over the per-part aggregate: one shuffle for
    // the groupBy, a broadcast for the scalar, never a correlated
    // per-row subquery. Ref: /root/reference/benchmark/tpch/q11.sql
    "h11_important_parts" -> ((s, dir) => {
      // micro-units are derived PER ROW before aggregating (ADVICE r12:
      // a post-SUM ×1e6 pushes DuckDB's decimal width past 38 and
      // silently degrades the oracle side to DOUBLE); per-row
      // DECIMAL(28,6)×1e6 is width-38 exact in both engines, so the
      // arithmetic is integral end to end.
      val pp = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(
          sum(col("l_extendedprice").cast(D)).as("v"),
          sum((col("l_extendedprice").cast(D) * lit(1000000))
            .cast("bigint")).as("v_mu"))
      val g = pp.agg(
        sum(col("v_mu")).as("tot_mu"),
        count(lit(1)).as("np"))
      // The cross-product runs in DECIMAL(38,0) (Spark) / HUGEINT
      // (DuckDB) — the ds22 convention — because BIGINT does NOT hold
      // it: measured tot_mu is 3.2e16 at sf0.1 already (corpus value in
      // micro-units scales linearly, ~3e19 at sf100) and np ~2e7 at
      // sf100, so v_mu·np·5 can reach ~1e27 ≫ 9.2e18 (Long.Max falls
      // around sf3–30). DECIMAL(38,0) is exact to 1e38 — safe through
      // sf100 with ~11 orders of margin.
      val D38 = DecimalType(38, 0)
      pp.crossJoin(broadcast(g))
        .filter(col("v_mu").cast(D38) * col("np").cast(D38) * lit(5L) >
          col("tot_mu").cast(D38) * lit(6L))
        .select(col("l_partkey"), col("v").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // Q10 returned-item reporting: top customers by lost revenue
    "h10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "A")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14 promotion effect: conditional aggregation over a part join
    "h14_promo_effect" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .agg(
          (lit(100.0) *
            dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) /
            dsum(rev)).as("promo_revenue_pct"),
          count(lit(1)).as("n"))
    }),

    // Q8 national market share: conditional aggregation over an 8-table
    // join (reference benchmark/tpch/q8.sql). Fact scanned once; the two
    // nation roles are separate aliased bounded broadcasts; AQE sizes the
    // scale-proportional dims.
    "h8_market_share" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_nationkey"),
          col("n_regionkey").as("n1_regionkey")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_nationkey"),
          col("n_name").as("nation")))
      val r = broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") <= lit("1997-12-31").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n1, c("c_nationkey") === n1("n1_nationkey"))
        .join(r, n1("n1_regionkey") === r("r_regionkey"))
        .join(n2, sup("s_nationkey") === n2("n2_nationkey"))
        .select(year(col("o_orderdate")).as("o_year"),
          rev.as("volume"), col("nation"))
        .groupBy(col("o_year"))
        .agg((dsum(when(col("nation") === "NATION_5", col("volume"))
            .otherwise(lit(0.0))) / dsum(col("volume"))).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q12 shipping-priority lines: two conditional counts per group
    // (reference q12.sql; no l_shipmode in the synthetic schema —
    // grouped by l_linestatus instead, same plan shape)
    "h12_priority_lines" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "N"))
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // Q17 small-quantity-order revenue: correlated avg subquery,
    // decorrelated to a per-partkey aggregate joined back (reference
    // q17.sql; the aggregate input is semi-joined to the brand's parts
    // first so only relevant partkeys are aggregated). The threshold is a
    // DECIMAL-exact sum cast to double, then *0.2/count in double — the
    // identical FP sequence DuckDB runs, so the comparison is
    // deterministic (see scaladoc on dsum).
    "h17_small_qty_revenue" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#3")
        .select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
      val lim = l.join(p, l("l_partkey") === p("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg((dsum(col("l_quantity")) * lit(0.2) / count(lit(1)))
          .as("qty_limit"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(lim, Seq("l_partkey"))
        .filter(col("l_quantity") < col("qty_limit"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n"))
    }),

    // Q20 potential part promotion: nested IN over an aggregate
    // (reference q20.sql; no partsupp table — the inner aggregate is
    // shipped quantity per (suppkey, partkey) over a year, thresholded)
    "h20_part_promotion" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_name").like("small%")).select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val heavy = l.join(p, l("l_partkey") === p("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("shipped"))
        .filter(col("shipped") > 30.0)
        .select(col("l_suppkey").as("s_suppkey")).distinct()
      val n = broadcast(t(s, dir, "nation")
        .filter(col("n_name") === "NATION_3"))
      val sup = t(s, dir, "supplier")
      sup.join(heavy, Seq("s_suppkey"), "left_semi")
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }),

    // Q21 suppliers who kept orders waiting: EXISTS + NOT EXISTS over
    // lineitem self-joins (reference q21.sql; no l_receiptdate /
    // l_commitdate in the synthetic schema — "late" adapted to
    // l_returnflag = 'R'). The EXISTS/NOT EXISTS become semi/anti
    // self-joins on l_orderkey with a non-equi supplier-differs clause —
    // shuffle on orderkey, never all-pairs.
    "h21_waiting_suppliers" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val l1 = l.filter(col("l_returnflag") === "R").as("l1")
      val l2 = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
      val l3 = l.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val sup = t(s, dir, "supplier")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region")
        .filter(col("r_name") === "EUROPE"))
      l1.join(l2, col("l1.l_orderkey") === col("o2") &&
          col("l1.l_suppkey") =!= col("s2"), "left_semi")
        .join(l3, col("l1.l_orderkey") === col("o3") &&
          col("l1.l_suppkey") =!= col("s3"), "left_anti")
        .join(o, col("l1.l_orderkey") === o("o_orderkey"))
        .join(sup, col("l1.l_suppkey") === sup("s_suppkey"))
        .join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }),

    // Q4 order-priority checking: EXISTS → semi-join on the fact key
    // (reference q4.sql; no l_commitdate/l_receiptdate — "late" adapted
    // to l_returnflag = 'R', same as h21)
    "h4_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      val late = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("o_orderkey"))
      o.join(late, Seq("o_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q7 volume shipping between two regions, both directions
    // (reference q7.sql; nation pair widened to the region pair so every
    // scale factor has rows)
    "h7_volume_shipping" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      val n1 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("n1_nationkey"),
          col("n_regionkey").as("n1_regionkey")))
      val n2 = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("n2_nationkey"),
          col("n_regionkey").as("n2_regionkey")))
      val r1 = broadcast(t(s, dir, "region")
        .select(col("r_regionkey").as("r1_regionkey"),
          col("r_name").as("supp_region")))
      val r2 = broadcast(t(s, dir, "region")
        .select(col("r_regionkey").as("r2_regionkey"),
          col("r_name").as("cust_region")))
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") <= lit("1997-12-31").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n1, sup("s_nationkey") === n1("n1_nationkey"))
        .join(n2, c("c_nationkey") === n2("n2_nationkey"))
        .join(r1, n1("n1_regionkey") === r1("r1_regionkey"))
        .join(r2, n2("n2_regionkey") === r2("r2_regionkey"))
        .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE")
          || (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
    }),

    // Q13 customer order-count distribution: LEFT OUTER join with an
    // extra join-side predicate, double aggregation (reference q13.sql;
    // no o_comment — the join filter is on o_orderpriority)
    "h13_cust_distribution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q15 top supplier: revenue CTE + scalar max subquery
    "h15_top_supplier" -> ((s, dir) => {
      val revenue = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum(rev).as("total_revenue"))
      val mx = revenue.agg(max(col("total_revenue")).as("mx"))
      t(s, dir, "supplier")
        .join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(broadcast(mx), col("total_revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q19 discounted revenue: three disjunctive brand/size/quantity
    // branches over one part join (reference q19.sql; no
    // container/shipmode/shipinstruct in the synthetic schema)
    "h19_disjunctive_rev" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .agg(dsum(rev).as("revenue"), count(lit(1)).as("n"))
    }),

    // Q22 global sales opportunity: avg scalar subquery + anti-join
    // (reference q22.sql; no c_phone — cntrycode is c_nationkey % 5, and
    // "no orders" adapted to "no 1-URGENT orders" since every synthetic
    // customer has orders)
    "h22_sales_opportunity" -> ((s, dir) => {
      val codes = t(s, dir, "customer")
        .filter((col("c_nationkey") % 5).isin(0, 1, 2))
        .select(col("c_custkey"), (col("c_nationkey") % 5).as("cntrycode"),
          col("c_acctbal"))
      val thr = codes.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("a"))
      val urgent = t(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("c_custkey"))
      codes.join(urgent, Seq("c_custkey"), "left_anti")
        .join(broadcast(thr))
        .filter(col("c_acctbal") > col("a"))
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    }),

    // Q18 large-volume customers (semi-join on a grouped subquery)
    "h18_large_orders" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(50)
    })
  )

  val oracles: Map[String, String] = Map(
    "h3_shipping_priority" -> """
      SELECT l_orderkey, o_orderdate,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "h5_local_supplier" -> """
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "h6_forecast_revenue" -> """
      SELECT
        CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24""",
    "h11_important_parts" -> """
      WITH pp AS (
        SELECT l_partkey,
          SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS v,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * 1000000
                   AS BIGINT)) AS v_mu
        FROM lineitem GROUP BY l_partkey),
      g AS (
        SELECT CAST(SUM(v_mu) AS BIGINT) AS tot_mu, COUNT(*) AS np
        FROM pp)
      SELECT l_partkey, CAST(v AS DOUBLE) AS value
      FROM pp, g
      WHERE CAST(v_mu AS HUGEINT) * np * 5 > CAST(tot_mu AS HUGEINT) * 6
      ORDER BY value DESC, l_partkey""",
    "h10_returned_items" -> """
      SELECT c_custkey, c_name, n_name,
        CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'A'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "h14_promo_effect" -> """
      SELECT 100.0 *
        CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
          THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
        AS promo_revenue_pct,
        COUNT(*) AS n
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate < TIMESTAMP '1997-10-01'""",
    "h4_order_priority" -> """
      SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT * FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "h7_volume_shipping" -> """
      WITH shipping AS (
        SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
          EXTRACT(year FROM l_shipdate) AS l_year,
          l_extendedprice * (1.0 - l_discount) AS volume
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
            OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                             AND TIMESTAMP '1997-12-31')
      SELECT supp_region, cust_region, CAST(l_year AS INT) AS l_year,
        CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM shipping GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    "h13_cust_distribution" -> """
      SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "h15_top_supplier" -> """
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
            AS DECIMAL(28,6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey""",
    "h19_disjunctive_rev" -> """
      SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
          AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",
    "h22_sales_opportunity" -> """
      WITH codes AS (
        SELECT c_custkey, c_nationkey % 5 AS cntrycode, c_acctbal
        FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)),
      thr AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
          / COUNT(*) AS a
        FROM codes WHERE c_acctbal > 0.0)
      SELECT cntrycode, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
      FROM codes, thr
      WHERE c_acctbal > a AND NOT EXISTS (SELECT * FROM orders
        WHERE o_custkey = codes.c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY cntrycode ORDER BY cntrycode""",
    "h8_market_share" -> """
      WITH all_nations AS (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               l_extendedprice * (1.0 - l_discount) AS volume,
               n2.n_name AS nation
        FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <= TIMESTAMP '1997-12-31')
      SELECT CAST(o_year AS INT) AS o_year,
        CAST(SUM(CAST(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0.0 END
          AS DECIMAL(28,6))) AS DOUBLE)
        / CAST(SUM(CAST(volume AS DECIMAL(28,6))) AS DOUBLE) AS mkt_share
      FROM all_nations GROUP BY o_year ORDER BY o_year""",
    "h12_priority_lines" -> """
      SELECT l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag IN ('A', 'N')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus""",
    "h17_small_qty_revenue" -> """
      WITH lim AS (
        SELECT l_partkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) * 0.2
            / COUNT(*) AS qty_limit
        FROM lineitem
        WHERE l_partkey IN
          (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
        GROUP BY l_partkey)
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0
          AS avg_yearly,
        COUNT(*) AS n
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN lim ON lim.l_partkey = lineitem.l_partkey
      WHERE p_brand = 'Brand#3' AND l_quantity < qty_limit""",
    "h20_part_promotion" -> """
      WITH heavy AS (
        SELECT l_suppkey AS s_suppkey
        FROM lineitem
        WHERE l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 30.0)
      SELECT s_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
        AND s_suppkey IN (SELECT s_suppkey FROM heavy)
      ORDER BY s_name""",
    "h21_waiting_suppliers" -> """
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier, lineitem l1, orders, nation, region
      WHERE s_suppkey = l1.l_suppkey
        AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT * FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT * FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R')
        AND s_nationkey = n_nationkey
        AND n_regionkey = r_regionkey
        AND r_name = 'EUROPE'
      GROUP BY s_name ORDER BY numwait DESC, s_name""",
    "h18_large_orders" -> """
      WITH big AS (
        SELECT l_orderkey,
          CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) > 250)
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
      FROM orders JOIN big ON o_orderkey = big.l_orderkey
                  JOIN customer ON o_custkey = c_custkey
      ORDER BY total_qty DESC, o_orderkey LIMIT 50"""
  )
}
