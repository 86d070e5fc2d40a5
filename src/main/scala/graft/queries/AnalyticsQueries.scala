package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Analytic reshaping + statistics breadth: PIVOT / UNPIVOT, exact
  * interpolated percentiles, correlated LATERAL joins, time-series
  * gap-filling, and the statistical aggregate kernels
  * (corr/covar/stddev/variance). These are everyday shapes for an OLAP
  * user of the reference (its cursor surface returns whatever the plan
  * produces — pivoting/melting is done client-side there; here they're
  * engine-native plans).
  *
  * Scale notes: pivot compiles to one hash aggregate with a fixed (3-arm)
  * value list — no extra shuffle vs the plain groupBy; unpivot is a
  * narrow Expand (rows × 2, no shuffle); percentile is a single
  * sort-based aggregate sharded by group key; the lateral top-k
  * decorrelates to a window per nation (no per-row subquery execution);
  * gap-fill's month spine is ~tens of rows exploded from one aggregate
  * row — the left join broadcasts the aggregated side, never the scan;
  * the stats kernels are one-pass algebraic moments (partial+final).
  */
object AnalyticsQueries {
  private val D = DecimalType(28, 6)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- PIVOT: monthly revenue spread across order-status columns.
    // Explicit value list keeps the plan a single aggregate (no
    // distinct-scan to discover pivot values) — at 100 TB the
    // value-discovery pass is the difference between one scan and two. ---
    "pv1_pivot" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(round(sum(col("o_totalprice").cast(D)).cast("double"), 2))
        .orderBy(col("m"))
    }),

    // --- UNPIVOT (melt): wide per-priority metrics to (metric, value)
    // rows. Expand node: narrow, rows×2, no shuffle. ---
    "pv2_unpivot" -> ((s, dir) => {
      val wide = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("double").as("cnt"),
          round(sum(col("o_totalprice").cast(D)).cast("double"), 2)
            .as("rev"))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("cnt"), col("rev")), "metric", "value")
        .orderBy(col("o_orderpriority"), col("metric"))
    }),

    // --- exact interpolated percentiles (PG percentile_cont /
    // DuckDB quantile_cont semantics) per group ---
    "pc1_percentile" -> ((s, dir) => {
      def pct(p: Double, as: String): Column =
        round(expr(s"percentile(value, $p)"), 6).as(as)
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(pct(0.25, "p25"), pct(0.5, "p50"), pct(0.75, "p75"),
          pct(0.9, "p90"), count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // --- correlated LATERAL subquery with ORDER BY + LIMIT: top-2
    // orders per nation. Catalyst decorrelates to a lateral join over a
    // windowed inner plan — one pass over orders, not 25 subquery runs. ---
    "lt1_lateral_topk" -> ((s, dir) => {
      Seq("nation", "customer", "orders")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql("""
        SELECT n.n_name, t.o_orderkey, t.price
        FROM nation n, LATERAL (
          SELECT o.o_orderkey, o.o_totalprice AS price
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
        ORDER BY n.n_name, t.price DESC, t.o_orderkey""")
    }),

    // --- time-series gap-fill: month spine from one (min,max) aggregate
    // row exploded with sequence(); sparse high-value months LEFT-joined
    // onto it, absent months zero-filled. The spine side is O(months) —
    // broadcast by construction regardless of fact size. ---
    "ts1_gapfill" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val spine = o.agg(
          date_trunc("month", min(col("o_orderdate"))).as("mn"),
          date_trunc("month", max(col("o_orderdate"))).as("mx"))
        .select(explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL 1 MONTH"))).as("m"))
      val sparse = o.filter(col("o_totalprice") > 499000)
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice").cast(D)).cast("double"), 2)
            .as("rev"))
      spine.join(sparse, Seq("m"), "left")
        .select(col("m"), coalesce(col("cnt"), lit(0L)).as("cnt"),
          coalesce(col("rev"), lit(0.0)).as("rev"))
        .orderBy(col("m"))
    }),

    // --- OHLC resample bars (the classic market-data downsample; also
    // the reference's JSONBench-style event rollup shape): per
    // (event_type, hour) the first/last/min/max of `value` plus volume.
    // Open/close are made deterministic by ordering on (t, event_id) —
    // event_id is unique — via first/last over an unbounded frame; the
    // subsequent aggregate collapses the (constant-per-partition)
    // open/close with max(). One shuffle on the (type, hour) key; the
    // window and the aggregate share the same partitioning so the
    // exchange is reused. No FP arithmetic — values pass through
    // untouched, so the hash check is exact by construction. ---
    "ts2_ohlc_bars" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.events(s, dir)
        .select(col("event_type"), date_trunc("hour", col("t")).as("h"),
          col("t"), col("event_id"), col("value"))
      val w = Window.partitionBy(col("event_type"), col("h"))
        .orderBy(col("t"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      base
        .withColumn("open", first(col("value")).over(w))
        .withColumn("close", last(col("value")).over(w))
        .groupBy(col("event_type"), col("h"))
        .agg(max(col("open")).as("open"), max(col("value")).as("high"),
          min(col("value")).as("low"), max(col("close")).as("close"),
          count(lit(1)).as("volume"))
        .orderBy(col("event_type"), col("h"))
    }),

    // --- statistical aggregate kernels: corr / covar_samp / stddev_samp
    // / var_pop — one-pass algebraic moments, partial+final split ---
    "st1_stats" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 6)
            .as("cov_qd"),
          round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
          round(var_pop(col("l_tax")), 6).as("var_tax"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // --- higher central moments (skewness, excess kurtosis) computed
    // from EXACT decimal power sums, not the engine built-ins: Spark's
    // `skewness` is the population moment while DuckDB's is the
    // bias-corrected sample statistic, so the built-ins can never agree
    // cross-engine. Summing v, v², v³, v⁴ as DECIMAL(38,6) is exact and
    // ALGEBRAIC — partials merge map-side, one shuffle of O(#groups)
    // rows carries all four moments at any scale — and the final
    // double-precision formula is evaluated identically by both
    // engines (single-pass moment kernel, the textbook large-scale
    // shape) ---
    "st2_higher_moments" -> ((s, dir) => {
      val dt = "decimal(38,6)"
      val v = col("value")
      val a = Tables.load(s, dir, "events")
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(v.cast(dt)).as("s1d"),
          sum((v * v).cast(dt)).as("s2d"),
          sum((v * v * v).cast(dt)).as("s3d"),
          sum((v * v * v * v).cast(dt)).as("s4d"))
      val b = a.select(col("event_type"), col("n"),
        (col("s1d").cast("double") / col("n")).as("m1"),
        (col("s2d").cast("double") / col("n")).as("p2"),
        (col("s3d").cast("double") / col("n")).as("p3"),
        (col("s4d").cast("double") / col("n")).as("p4"))
      val c = b.withColumn("m2", col("p2") - col("m1") * col("m1"))
      c.select(col("event_type"), col("n"),
          round((col("p3") - lit(3.0) * col("m1") * col("p2")
              + lit(2.0) * col("m1") * col("m1") * col("m1"))
            / pow(col("m2"), 1.5), 6).as("skew"),
          round((col("p4") - lit(4.0) * col("m1") * col("p3")
              + lit(6.0) * col("m1") * col("m1") * col("p2")
              - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1"))
            / (col("m2") * col("m2")) - lit(3.0), 6).as("kurt"))
        .orderBy(col("event_type"))
    }),

    // --- ML feature engineering: per-group z-score standardization.
    // Group mean/variance come from EXACT decimal power sums (the st2
    // kernel — algebraic, one O(#groups) shuffle), broadcast back onto
    // the rows as a narrow map-side join; the per-row double chain
    // ((v − m)/σ, IEEE sqrt is correctly rounded) is identical in both
    // engines and rounds once to 6 dp — hash-exact at any scale ---
    "fe1_zscore" -> ((s, dir) => {
      val dt = "decimal(38,6)"
      val v = col("value")
      val stats = Tables.load(s, dir, "events")
        .groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(v.cast(dt)).as("s1d"),
          sum((v * v).cast(dt)).as("s2d"))
        .select(col("event_type"),
          (col("s1d").cast("double") / col("n")).as("m"),
          (col("s2d").cast("double") / col("n")
            - (col("s1d").cast("double") / col("n"))
            * (col("s1d").cast("double") / col("n"))).as("vr"))
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
        .join(broadcast(stats), Seq("event_type"))
        .select(col("event_id"), col("event_type"),
          round((col("value") - col("m")) / sqrt(col("vr")), 6).as("z"))
        .orderBy(col("event_id"))
    }),

    // --- ML feature engineering: winsorized group statistics. The p05 /
    // p95 clip limits are EXACT order statistics picked at integer rank
    // positions ceil(n/20) / ceil(19n/20) — computed as (n+19) div 20,
    // no floating-point percentile math anywhere — and the clipped mean
    // rides as DECIMAL. Scale note: exact per-group percentiles need the
    // per-group sort (one wide window); at 100 TB you trade this for
    // approx_percentile (see pc1) — this is the exact-auditable twin ---
    "fe2_winsorize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val ranked = Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val lims = ranked.groupBy(col("event_type")).agg(
        max(when(col("rn") === expr("(n + 19) div 20"), col("value")))
          .as("lo"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("value")))
          .as("hi"))
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("value"))
        .join(broadcast(lims), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), first(col("lo")).as("lo"),
          first(col("hi")).as("hi"),
          round(sum(greatest(col("lo"), least(col("hi"), col("value")))
              .cast("decimal(38,6)")).cast("double") / count(lit(1)), 6)
            .as("wmean"))
        .orderBy(col("event_type"))
    }),

    // --- min-max feature scaling: per-type [0,1] rescale of `value`,
    // rolled up per (type, user) with min/max/count. Every scaled value
    // is one exact-rounded IEEE chain ((v−lo)/(hi−lo) — +,−,/ are
    // correctly rounded, bit-identical in any engine), and the rollup
    // uses only ORDER-INDEPENDENT aggregates (min/max/count — no sum of
    // computed doubles), so the check is hash-exact with zero rounding.
    // Scale shape: the per-type (lo,hi) frame is O(#types) broadcast;
    // one shuffle for the (type,user) rollup ---
    "fe3_minmax_scale" -> ((s, dir) => {
      val stats = Tables.load(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      Tables.load(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"))
        .join(broadcast(stats), Seq("event_type"))
        .select(col("event_type"), col("user_id"),
          ((col("value") - col("lo")) / (col("hi") - col("lo")))
            .as("scaled"))
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(col("scaled")).as("lo_s"), max(col("scaled")).as("hi_s"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("user_id"))
    }))

  val oracles: Map[String, String] = Map(
    "fe3_minmax_scale" -> """
      WITH st AS (
        SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
        FROM events GROUP BY event_type),
      sc AS (
        SELECT e.event_type, e.user_id,
          (e.value - st.lo) / (st.hi - st.lo) AS scaled
        FROM events e JOIN st ON e.event_type = st.event_type)
      SELECT event_type, user_id, MIN(scaled) AS lo_s,
        MAX(scaled) AS hi_s, COUNT(*) AS n
      FROM sc GROUP BY event_type, user_id
      ORDER BY event_type, user_id""",
    "fe1_zscore" -> """
      WITH a AS (
        SELECT event_type, COUNT(*) AS n,
          SUM(CAST(value AS DECIMAL(38,6))) AS s1,
          SUM(CAST(value * value AS DECIMAL(38,6))) AS s2
        FROM events GROUP BY event_type),
      b AS (
        SELECT event_type,
          CAST(s1 AS DOUBLE) / n AS m,
          CAST(s2 AS DOUBLE) / n
            - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS vr
        FROM a)
      SELECT e.event_id, e.event_type,
        round((e.value - b.m) / sqrt(b.vr), 6) AS z
      FROM events e JOIN b USING (event_type)
      ORDER BY e.event_id""",
    "fe2_winsorize" -> """
      WITH ranked AS (
        SELECT event_type, value,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events),
      lims AS (
        SELECT event_type,
          MAX(CASE WHEN rn = (n + 19) // 20 THEN value END) AS lo,
          MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS hi
        FROM ranked GROUP BY event_type)
      SELECT e.event_type, COUNT(*) AS n, MAX(l.lo) AS lo, MAX(l.hi) AS hi,
        round(CAST(SUM(CAST(GREATEST(l.lo, LEAST(l.hi, e.value))
          AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) AS wmean
      FROM events e JOIN lims l USING (event_type)
      GROUP BY e.event_type ORDER BY e.event_type""",
    "pv1_pivot" -> """
      SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
             AS TIMESTAMP) AS m,
        ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'O'
          THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS DOUBLE), 2)
          AS "O",
        ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F'
          THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS DOUBLE), 2)
          AS "F",
        ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'P'
          THEN CAST(o_totalprice AS DECIMAL(28,6)) END) AS DOUBLE), 2)
          AS "P"
      FROM orders GROUP BY 1 ORDER BY m""",
    "pv2_unpivot" -> """
      WITH wide AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS DOUBLE) AS cnt,
          ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
            AS DOUBLE), 2) AS rev
        FROM orders GROUP BY 1)
      SELECT o_orderpriority, 'cnt' AS metric, cnt AS value FROM wide
      UNION ALL
      SELECT o_orderpriority, 'rev' AS metric, rev AS value FROM wide
      ORDER BY o_orderpriority, metric""",
    "pc1_percentile" -> """
      SELECT event_type,
        ROUND(quantile_cont(value, 0.25), 6) AS p25,
        ROUND(quantile_cont(value, 0.5), 6) AS p50,
        ROUND(quantile_cont(value, 0.75), 6) AS p75,
        ROUND(quantile_cont(value, 0.9), 6) AS p90,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type""",
    "lt1_lateral_topk" -> """
      SELECT n.n_name, t.o_orderkey, t.price
      FROM nation n, LATERAL (
        SELECT o.o_orderkey, o.o_totalprice AS price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) t
      ORDER BY n.n_name, t.price DESC, t.o_orderkey""",
    "ts1_gapfill" -> """
      WITH span AS (
        SELECT date_trunc('month', CAST(min(o_orderdate) AS TIMESTAMP))
            AS mn,
          date_trunc('month', CAST(max(o_orderdate) AS TIMESTAMP)) AS mx
        FROM orders),
      months AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS m
        FROM span),
      agg AS (
        SELECT date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS m,
          COUNT(*) AS cnt,
          ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
            AS DOUBLE), 2) AS rev
        FROM orders WHERE o_totalprice > 499000 GROUP BY 1)
      SELECT months.m, COALESCE(cnt, 0) AS cnt,
        COALESCE(rev, 0.0) AS rev
      FROM months LEFT JOIN agg ON months.m = agg.m
      ORDER BY months.m""",
    "ts2_ohlc_bars" -> """
      WITH base AS (
        SELECT event_type,
          date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
          ts, event_id, value
        FROM events),
      oc AS (
        SELECT event_type, h, value,
          first_value(value) OVER (PARTITION BY event_type, h
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS open,
          last_value(value) OVER (PARTITION BY event_type, h
            ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS close
        FROM base)
      SELECT event_type, h, MAX(open) AS open, MAX(value) AS high,
        MIN(value) AS low, MAX(close) AS close, COUNT(*) AS volume
      FROM oc GROUP BY event_type, h ORDER BY event_type, h""",
    "st2_higher_moments" -> """
      WITH a AS (
        SELECT event_type, COUNT(*) AS n,
          SUM(CAST(value AS DECIMAL(38,6))) AS s1d,
          SUM(CAST(value * value AS DECIMAL(38,6))) AS s2d,
          SUM(CAST(value * value * value AS DECIMAL(38,6))) AS s3d,
          SUM(CAST(value * value * value * value AS DECIMAL(38,6))) AS s4d
        FROM events GROUP BY event_type),
      b AS (
        SELECT event_type, n,
          CAST(s1d AS DOUBLE) / n AS m1,
          CAST(s2d AS DOUBLE) / n AS p2,
          CAST(s3d AS DOUBLE) / n AS p3,
          CAST(s4d AS DOUBLE) / n AS p4
        FROM a),
      c AS (SELECT *, p2 - m1 * m1 AS m2 FROM b)
      SELECT event_type, n,
        ROUND((p3 - 3.0 * m1 * p2 + 2.0 * m1 * m1 * m1)
          / pow(m2, 1.5), 6) AS skew,
        ROUND((p4 - 4.0 * m1 * p3 + 6.0 * m1 * m1 * p2
            - 3.0 * m1 * m1 * m1 * m1)
          / (m2 * m2) - 3.0, 6) AS kurt
      FROM c ORDER BY event_type""",
    "st1_stats" -> """
      SELECT l_returnflag,
        ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        ROUND(covar_samp(l_quantity, l_discount), 6) AS cov_qd,
        ROUND(stddev_samp(l_discount), 6) AS sd_disc,
        ROUND(var_pop(l_tax), 6) AS var_tax,
        COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
}
