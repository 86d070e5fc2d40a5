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
  * These are the bench headliners: selective scans feeding broadcast-dim
  * joins into partial+final aggregation — the plan shape that must hold at
  * 100 TB (dims broadcast, fact table never re-shuffled except for its
  * one aggregation exchange).
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
      val c = broadcast(t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING"))
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
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey") &&
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

    // Q10 returned-item reporting: top customers by lost revenue
    "h10_returned_items" -> ((s, dir) => {
      val c = broadcast(t(s, dir, "customer"))
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
      val p = broadcast(t(s, dir, "part"))
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

    // Q18 large-volume customers (semi-join on a grouped subquery)
    "h18_large_orders" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val big = l.groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      val o = t(s, dir, "orders")
      val c = broadcast(t(s, dir, "customer"))
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
