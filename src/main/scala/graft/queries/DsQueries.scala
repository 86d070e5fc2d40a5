package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** TPC-DS-style analytic shapes over the driver schema.
  *
  * The reference ships the full TPC-DS corpus as a runnable workload
  * (/root/reference/benchmark/tpcds/, benchmark/SOURCES.md:1-20); the full
  * 24-table schema is out of scope for the driver's 8-table layout, but the
  * signature query *shapes* are not:
  *
  *   - ds1: grouping-sets hierarchy rollup with GROUPING()-derived level +
  *     rank-within-level (TPC-DS q36's lochierarchy pattern)
  *   - ds2: rank-within-category top-k over an aggregated join
  *     (q67's rank() <= k pruning pattern)
  *   - ds3: period-over-period delta via lag() on a calendar rollup
  *     (q89-family month-vs-prior-month deltas)
  *   - ds4: deviation-from-period-average selection (q47's
  *     avg-over-partition comparison pattern)
  *   - ds5: frequent-items two-level aggregation + best-customer top-k
  *     (q23's cross_items / best_ss_customer pattern)
  *   - ds6: multi-band counts in ONE conditional-aggregation scan
  *     (q88's eight cross-joined scalar subqueries, re-expressed)
  *   - ds7: two per-channel cumulative series full-outer joined with
  *     running-max carry and crossover filter (q51's web-vs-store
  *     cumulative comparison pattern)
  *
  * Scale notes: every shape is one shuffle (the groupBy) plus a window over
  * the *aggregated* (small) result — the window never sees base-table rows,
  * so partition width at 100 TB is bounded by group cardinality, not data
  * volume. Ratios are computed decimal-sum-first, cast to double only at
  * the end, so results are bit-reproducible across engines.
  */
object DsQueries {
  private val D = DecimalType(28, 6)

  /** ds38's 1997 per-row money profile — cents, discount basis points,
    * and the mu = cents·(10⁴−bp) micro-dollar product in DECIMAL(38,0).
    * (The r18 ds38a–f driver diagnostics that shared these expressions
    * were removed in r19 after confirming the decimal read-path
    * mechanism; ledger in PLANS.md §ds38.) */
  private def ds38Rows(s: SparkSession, dir: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
      lit(100)).cast("bigint")
    val discBp = (col("l_discount").cast(DecimalType(18, 4)) *
      lit(10000)).cast("bigint")
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.load(s, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        concat(col("n_name"), lit("_"),
          (col("s_suppkey") % 10).cast("string")).as("city"),
        cents.as("c"), discBp.as("b"),
        (cents * (lit(10000L) - discBp)).cast(D38).as("mu"))
  }

  /** ds38's top-5-nation gated rows (base LEFT SEMI top5). */
  private def ds38Kept(s: SparkSession, dir: String): DataFrame = {
    val base = ds38Rows(s, dir)
    val top5 = base.groupBy(col("n_name").as("tn"))
      .agg(sum(col("mu")).as("p"))
    val wr = Window.orderBy(col("p").desc, col("tn"))
    val keep = top5.select(col("tn"), rank().over(wr).as("rnk"))
      .filter(col("rnk") <= 5).select(col("tn"))
    base.join(keep, col("n_name") === col("tn"), "left_semi")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- q36 shape: margin rollup with lochierarchy + rank in level.
    // Ref: /root/reference/benchmark/tpcds/query36.tpl, query86.tpl ---
    "ds1_margin_rollup" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val agg = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .rollup(col("o_orderpriority"), col("l_returnflag"))
        .agg(
          (sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(D))
             .cast("double") /
           sum(col("l_extendedprice").cast(D)).cast("double")).as("margin"),
          (grouping(col("o_orderpriority")) + grouping(col("l_returnflag")))
            .cast("int").as("lochierarchy"))
      val w = Window
        .partitionBy(col("lochierarchy"),
          when(col("lochierarchy") === 0, col("o_orderpriority")))
        .orderBy(col("margin"), col("o_orderpriority"), col("l_returnflag"))
      agg
        .withColumn("rk", rank().over(w).cast("int"))
        .select(col("o_orderpriority"), col("l_returnflag"),
          round(col("margin"), 6).as("margin"), col("lochierarchy"), col("rk"))
        .orderBy(col("lochierarchy").desc, col("o_orderpriority"), col("rk"))
    }),

    // --- q67 shape: revenue rank within category, keep top-3 per brand.
    // Ref: /root/reference/benchmark/tpcds/query67.tpl ---
    "ds2_category_topk" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      val agg = l.join(p, l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(D)).cast("double").as("rev"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("rev").desc, col("p_partkey"))
      agg
        .withColumn("rk", rank().over(w).cast("int"))
        .filter(col("rk") <= 3)
        .orderBy(col("p_brand"), col("rk"))
    }),

    // --- q89 shape: month-over-month revenue delta per priority ---
    "ds3_period_delta" -> ((s, dir) => {
      val m = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .agg(sum(col("o_totalprice").cast(D)).as("rev_d"))
      val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("m"))
      m.withColumn("prev_d", lag(col("rev_d"), 1).over(w))
        .select(col("o_orderpriority"), col("m"),
          col("rev_d").cast("double").as("rev"),
          (col("rev_d") - col("prev_d")).cast("double").as("delta"),
          round(col("rev_d").cast("double") / col("prev_d").cast("double")
            - 1.0, 6).as("pct"))
        .orderBy(col("o_orderpriority"), col("m"))
    }),

    // --- q47 shape: daily totals deviating >5% from the period average.
    // The average is decimal-sum / count (order-independent), cast to
    // double only for the final ratio — reproducible in any engine. ---
    "ds4_avg_deviation" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("day", col("t")).as("d"))
        .agg(sum(col("value").cast(D)).as("tot_d"))
      val w = Window.partitionBy(col("event_type"))
      val ratioed = daily
        .withColumn("avg_tot",
          sum(col("tot_d")).over(w).cast("double") /
            count(lit(1)).over(w).cast("double"))
        .withColumn("ratio", col("tot_d").cast("double") / col("avg_tot"))
      ratioed
        .filter(abs(col("ratio") - 1.0) > 0.05)
        .select(col("event_type"), col("d"),
          col("tot_d").cast("double").as("tot"),
          round(col("avg_tot"), 6).as("avg_tot"),
          round(col("ratio"), 6).as("ratio"))
        .orderBy(col("event_type"), col("d"))
    }),

    // --- q23 shape: "frequent items" two-level aggregation — parts sold
    // in >= 4 distinct orders form the frequent set (first shuffle,
    // distinct-on-key), sales restricted to that set via a semi-join
    // (the frequent set is the filtered minority, so AQE broadcasts it),
    // then best-customer rollup + deterministic top-10. The window never
    // sees base rows, only the per-customer aggregate ---
    "ds5_frequent_items" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val freq = l.groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 4)
        .select(col("l_partkey"))
      l.join(freq, Seq("l_partkey"), "left_semi")
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(D)).cast("double").as("spend"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("spend").desc, col("o_custkey"))
        .limit(10)
    }),

    // --- q88 shape (/root/reference/benchmark/tpcds/query88.tpl,
    // query96.tpl): the reference formulation is EIGHT scalar-count
    // subqueries cross-joined into one row (one scan per band); the
    // Spark-first re-expression is a single conditional-aggregation
    // pass — one scan, zero joins, map-side combined, identical result.
    // At 100 TB that's literally 8x less I/O than the textbook plan ---
    "ds6_multi_band" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
        .filter(col("l_discount") >= 0.02)
      def band(lo: Int, hi: Int) =
        sum(when(col("l_quantity") >= lo && col("l_quantity") < hi, 1L)
          .otherwise(0L))
      l.agg(
        band(0, 7).as("b1"), band(7, 14).as("b2"),
        band(14, 21).as("b3"), band(21, 28).as("b4"),
        band(28, 35).as("b5"), band(35, 42).as("b6"),
        band(42, 49).as("b7"), band(49, 1000).as("b8"))
    }),

    // --- q51 shape: two per-channel cumulative revenue series (urgent vs
    // routine order priority standing in for web vs store), FULL OUTER
    // joined on (bucket, month), running-max carrying each side across
    // the other's missing months, crossover months kept. Prices convert
    // to EXACT integer cents at the scan (round(x*100) of an IEEE-exact
    // product — a direct double→DECIMAL cast rounds ties differently
    // across engines, seen in CORRECTNESS_r08) and every cumulative sum
    // stays BIGINT, so the check is hash-exact with zero FP anywhere.
    // Scale: each side is one groupBy shuffle; the windows run over the
    // aggregated monthly series (bounded by #months per bucket), and the
    // FOJ keys are the same (bucket, month) partitioning — no base-row
    // window ---
    "ds7_cumulative_crossover" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select(
        pmod(col("o_custkey"), lit(50)).as("bucket"),
        date_trunc("month", col("o_orderdate").cast("timestamp")).as("m"),
        col("o_orderpriority").as("pri"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      def side(f: org.apache.spark.sql.Column, out: String) = o.filter(f)
        .groupBy(col("bucket"), col("m"))
        .agg(sum(col("cents")).as("rev"))
        .withColumn(out, sum(col("rev")).over(
          Window.partitionBy(col("bucket")).orderBy(col("m"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("bigint"))
        .select(col("bucket"), col("m"), col(out))
      val hi = side(col("pri").isin("1-URGENT", "2-HIGH"), "cum_hi")
      val lo = side(!col("pri").isin("1-URGENT", "2-HIGH"), "cum_lo")
      val w = Window.partitionBy(col("bucket")).orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hi.join(lo, Seq("bucket", "m"), "full_outer")
        .withColumn("urgent_cum_cents", max(col("cum_hi")).over(w))
        .withColumn("routine_cum_cents", max(col("cum_lo")).over(w))
        .filter(col("urgent_cum_cents") > col("routine_cum_cents"))
        .select(col("bucket"), col("m"), col("urgent_cum_cents"),
          col("routine_cum_cents"))
        .orderBy(col("bucket"), col("m"))
    }),

    // --- q64 shape: multi-channel self-join across adjacent years —
    // customers whose routine-channel spend the FOLLOWING year exceeds
    // their urgent-channel spend this year (TPC-DS q64 joins store and
    // catalog sales of the same item across two years; priority classes
    // stand in for channels on the 8-table schema). Scale: ONE (custkey,
    // year, channel) aggregation — the self-join then runs on the
    // already-reduced frame, keyed on custkey (equi, AQE-sized), never on
    // base orders. Exact integer cents end-to-end, hash-exact ---
    "ds8_multichannel" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select(
        col("o_custkey").as("ck"),
        year(col("o_orderdate")).cast("int").as("y"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent")
          .otherwise("routine").as("chan"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      val agg = o.groupBy(col("ck"), col("y"), col("chan"))
        .agg(sum(col("cents")).as("spend"))
      val u = agg.filter(col("chan") === "urgent")
        .select(col("ck"), col("y").as("y1"), col("spend").as("u_cents"))
      val r = agg.filter(col("chan") === "routine")
        .select(col("ck").as("ck2"), col("y").as("y2"),
          col("spend").as("r_cents"))
      u.join(r, col("ck") === col("ck2") && col("y2") === col("y1") + 1)
        .filter(col("r_cents") > col("u_cents"))
        .groupBy(col("y1"))
        .agg(count(lit(1)).as("n_grown"),
          sum(col("u_cents")).as("tot_u_cents"),
          sum(col("r_cents")).as("tot_r_cents"))
        .orderBy(col("y1"))
    }),

    // --- q73/q34 shape: customers in an order-count band, listed with
    // their counts and exact-cents spend. Two-phase: per-customer
    // aggregate (map-side combined), HAVING band filter — the reduced
    // frame IS the answer, no join back needed at this shape. Exact
    // integer cents end-to-end (the ds7/ds8 convention) ---
    "ds9_count_band" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("bigint").as("cents"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("spend_cents"))
        .filter(col("n_orders") >= 8 && col("n_orders") <= 12)
        .orderBy(col("o_custkey"))
    }),

    // --- q93 shape (/root/reference/benchmark/tpcds/query93.tpl,
    // query50.tpl's sold-vs-returned lag family): returns-adjusted
    // order quantities — per order, the
    // shipped quantity net of returned lines (l_returnflag = 'R'), top
    // 15 by net quantity. One conditional-aggregation scan (no join to
    // a returns table needed at this schema); exact DECIMAL sums so the
    // double quantities hash-match ---
    "ds10_net_returns" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          sum(col("l_quantity").cast(D)).as("q_all"),
          sum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0.0)).cast(D)).as("q_ret"),
          count(lit(1)).as("n_lines"))
        .select(col("l_orderkey"),
          (col("q_all") - col("q_ret")).cast("double").as("net_qty"),
          col("q_ret").cast("double").as("ret_qty"), col("n_lines"))
        .orderBy(col("net_qty").desc, col("l_orderkey"))
        .limit(15)
    }),

    // --- q67 shape proper (VERDICT r10 #6): ROLLUP over a 3-level
    // hierarchy (priority → year → month) THEN a per-priority top-k
    // window over the rolled-up rows — TPC-DS q67's
    // rollup-then-rank-within-category composition. Money as exact
    // integer cents (the ds6 scan-level convention) so every aggregate
    // and the ranking are hash-exact. Scale shape: one partial+final
    // rollup aggregate (Catalyst expands to grouping sets with map-side
    // combine) and the window runs on the AGGREGATED frame (≤ priorities
    // × years × months rows), rank-limit pushed as WindowGroupLimit —
    // never corpus-shaped ---
    "ds11_rollup_topk" -> ((s, dir) => {
      val base = Tables.load(s, dir, "orders").select(
        col("o_orderpriority").as("prio"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
      val agg = base.rollup(col("prio"), col("yr"), col("mo"))
        .agg(sum(col("cents")).cast("bigint").as("sales_cents"),
          grouping_id().cast("int").as("gid"))
      // (sales desc, gid, yr, mo) is total within a prio partition:
      // gid separates rollup levels, and within a level the non-rolled
      // (yr, mo) prefix is unique
      val w = Window.partitionBy(col("prio"))
        .orderBy(col("sales_cents").desc, col("gid").asc,
          col("yr").asc_nulls_first, col("mo").asc_nulls_first)
      agg.withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 5)
        .select(col("prio"), col("yr"), col("mo"), col("sales_cents"),
          col("gid"), col("rk"))
        .orderBy(col("prio").asc_nulls_first, col("rk"))
    }),

    // --- q97 shape: two channels' distinct (customer, item) sets over a
    // date window, FULL OUTER joined, three-way overlap counts
    // (store_only / catalog_only / both). Channels here are click vs
    // purchase events, the (customer, item) grain is (user_id, day).
    // Scale shape: each channel is a partial-aggregated DISTINCT on its
    // own (u, d) key, the FULL OUTER join shuffles both sides on that
    // same key (no broadcast — both channels are corpus-proportional),
    // and the output is a 1-row global aggregate. All-integer.
    // Ref: /root/reference/benchmark/tpcds/query97.tpl ---
    "ds12_channel_overlap" -> ((s, dir) => {
      val e = graft.Tables.events(s, dir)
        .filter(col("t") < lit("2024-01-16").cast("timestamp"))
      def chan(tp: String, a: String) =
        e.filter(col("event_type") === tp)
          .select(col("user_id").as(s"${a}_u"),
            date_trunc("day", col("t")).as(s"${a}_d"))
          .distinct()
      chan("click", "c")
        .join(chan("purchase", "p"),
          col("c_u") === col("p_u") && col("c_d") === col("p_d"),
          "full_outer")
        .agg(
          sum(when(col("c_u").isNotNull && col("p_u").isNull, 1L)
            .otherwise(0L)).as("click_only"),
          sum(when(col("c_u").isNull && col("p_u").isNotNull, 1L)
            .otherwise(0L)).as("purchase_only"),
          sum(when(col("c_u").isNotNull && col("p_u").isNotNull, 1L)
            .otherwise(0L)).as("click_and_purchase"))
    }),

    // --- TPC-DS q35's signature: EXISTS a AND (EXISTS b OR EXISTS c) —
    // customers present in one channel AND in at least one of two
    // others, rolled up by a demographic dim. The scale-right rewrite:
    // each EXISTS is a LEFT SEMI join on the customer key, and the OR
    // of two EXISTS becomes ONE semi join against the UNION of the two
    // subqueries' keys (never a correlated per-row probe, never a
    // row-exploding inner join — semi joins can't duplicate). Grain
    // stays one row per customer until the final O(#segments) rollup.
    // Ref: /root/reference/benchmark/tpcds/query35.tpl ---
    "ds13_multi_exists" -> ((s, dir) => {
      val c = graft.Tables.load(s, dir, "customer")
      val o = graft.Tables.load(s, dir, "orders")
      val chanA = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val chanB = o.filter(col("o_totalprice") > 150000.0)
        .select(col("o_custkey"))
      val chanC = o.filter(col("o_orderpriority") === "5-LOW")
        .select(col("o_custkey"))
      val chanBorC = chanB.union(chanC)
      c.join(chanA, c("c_custkey") === chanA("o_custkey"), "left_semi")
        .join(chanBorC, c("c_custkey") === chanBorC("o_custkey"),
          "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          min(col("c_name")).as("first_cust"),
          sum(round(col("c_acctbal") * 100).cast("bigint"))
            .as("acctbal_cents"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- TPC-DS q21's before/after pivot (query21.tpl; query37.tpl/
    // query82.tpl's inventory-band family shares the grain): per
    // (warehouse, item) —
    // here (supplier, part) — quantity shipped strictly before vs on-or-after
    // a pivot date, kept only where both sides are non-zero and their
    // ratio sits in [2/3, 3/2]. The ratio gate is pure integer
    // cross-multiplication (2·qb ≤ 3·qa AND 2·qa ≤ 3·qb) — no division,
    // bit-identical in both engines. One shuffle on the (supp, part)
    // grain with partial aggregation; supplier is scale-proportional
    // (SF×10k) so no broadcast hint — AQE picks the build side from
    // runtime sizes ---
    "ds14_before_after" -> ((s, dir) => {
      val pivot = lit("1998-07-01").cast("timestamp")
      val g = graft.Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey"),
          col("l_quantity").cast("bigint").as("qty"),
          (col("l_shipdate") < pivot).as("before"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(when(col("before"), col("qty")).otherwise(0L))
            .as("qty_before"),
          sum(when(!col("before"), col("qty")).otherwise(0L))
            .as("qty_after"))
        .filter(col("qty_before") > 0 && col("qty_after") > 0 &&
          col("qty_before") * 2 <= col("qty_after") * 3 &&
          col("qty_after") * 2 <= col("qty_before") * 3)
      val sup = graft.Tables.load(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))
      g.join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("l_partkey").as("p_partkey"),
          col("qty_before"), col("qty_after"))
        .orderBy(col("s_name"), col("p_partkey"))
    }),

    // --- TPC-DS q14's cross_items: items sold in ALL channels (the
    // INTERSECT of three per-channel item-key sets), then revenue of
    // exactly those items rolled up by brand. Channels here are
    // return-flag classes (R / A / N — the driver schema carries no
    // ship mode). Scale shape: each channel
    // set is a partial-aggregated DISTINCT on the bare item key (narrow
    // — one BIGINT column reaches the shuffle), INTERSECT is Spark's
    // left-semi aggregate (never materializes pairs), and the small
    // surviving set comes back as ONE semi join on the fact — the wide
    // lineitem columns are scanned once, after pruning. No row can
    // duplicate (semi), so the brand rollup grain is exact.
    // Ref: /root/reference/benchmark/tpcds/query14.tpl ---
    "ds15_cross_channel_items" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      def chan(flags: String*) =
        l.filter(col("l_returnflag").isin(flags: _*))
          .select(col("l_partkey")).distinct()
      val cross = chan("R").intersect(chan("A")).intersect(chan("N"))
      l.join(cross, Seq("l_partkey"), "left_semi")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(D)).cast("double").as("rev"),
          count(lit(1)).as("n"))
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q11/q74's two-channel year-over-year ratio compare:
    // customers whose channel-B revenue grew FASTER year-over-year than
    // their channel-A revenue. The template materializes a year_total
    // CTE and self-joins it FOUR ways (s_first/s_sec/w_first/w_sec);
    // re-expressed Spark-first as ONE conditional aggregation on the
    // customer grain — the four logical year_total scans become four
    // CASE sums in a single shuffle, and the ratio-of-ratios filter
    // w2/w1 > s2/s1 becomes the integer cross-multiplication
    // w2·s1 > s2·w1 (all four totals required positive, as in the
    // template's year_total > 0 guards) — zero FP, bit-identical in
    // both engines. Channels ride o_orderpriority (the driver schema
    // has one sales fact, not store/web). Revenue is per-row exact
    // cents: l_extendedprice is a 2-dp money value, so
    // DECIMAL(28,2)×100 → BIGINT is exact. Overflow margin: a
    // customer-year total below 9.2e16 cents (~$9e14) keeps the
    // cross-product under Long.Max through any plausible scale.
    // Ref: /root/reference/benchmark/tpcds/query11.tpl ---
    "ds16_yoy_channel_ratio" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        // the two years as a timestamp RANGE, not year(...) IN — an
        // expression over the column cannot reach the scan; the range
        // shows up in PushedFilters and prunes at the reader
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("yr"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "s")
            .otherwise("w").as("chan"))
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast(DecimalType(28, 2)) * lit(100))
            .cast("bigint").as("cents"))
      def cell(ch: String, y: Int) =
        sum(when(col("chan") === ch && col("yr") === y, col("cents"))
          .otherwise(0L))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(cell("s", 1997).as("s1"), cell("s", 1998).as("s2"),
          cell("w", 1997).as("w1"), cell("w", 1998).as("w2"))
        .filter(col("s1") > 0 && col("w1") > 0 &&
          col("s2") > 0 && col("w2") > 0 &&
          col("w2") * col("s1") > col("s2") * col("w1"))
        .select(col("o_custkey").as("c_custkey"),
          col("s1"), col("s2"), col("w1"), col("w2"))
        .orderBy(col("c_custkey"))
    }),

    // --- TPC-DS q39's mean/stdev volatility band over a (key, period)
    // grid, self-joined across consecutive periods: per (supplier,
    // month) quantity series whose coefficient of variation exceeds 1/2
    // in BOTH month m and month m+1. The template's cov = stdev/mean
    // filter is FP-hazardous cross-engine (stddev_samp summation order
    // differs), so the band test is algebraized to integers:
    //   cov > 1/2  ⟺  var_samp > mean²/4
    //             ⟺  4·n·(n·Σx² − (Σx)²) > (n−1)·(Σx)²
    // computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact for
    // n up to ~2e11 rows per cell. Scale shape: ONE shuffle to the
    // (supp, month) grain with partial agg (the moments are
    // sum/sum-of-squares — map-side combinable); the template's
    // consecutive-period SELF-JOIN is re-expressed as a lead() window
    // over the AGGREGATED grid — one lineitem scan instead of two (the
    // self-join plan does not get exchange reuse), with the window
    // partitioned per supplier over ≤12 month rows (bounded frame — the
    // sanctioned unpartitioned-window exception does not even apply).
    // Means in the output are a single BIGINT→double division — the one
    // IEEE op both engines spell identically.
    // Ref: /root/reference/benchmark/tpcds/query39.tpl ---
    "ds17_volatility_band" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val q = col("l_quantity").cast("bigint")
      val g = Tables.load(s, dir, "lineitem")
        // timestamp range, not year(...) ===, so the filter reaches the
        // parquet scan as PushedFilters
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_suppkey"), month(col("l_shipdate")).as("m"))
        .agg(count(lit(1)).as("n"), sum(q).as("sx"),
          sum(q * q).as("sx2"))
        .filter(col("n") >= 2)
        .withColumn("band",
          lit(4).cast(D38) * col("n").cast(D38) *
            (col("n").cast(D38) * col("sx2").cast(D38) -
              col("sx").cast(D38) * col("sx").cast(D38)) >
          (col("n") - 1).cast(D38) *
            col("sx").cast(D38) * col("sx").cast(D38))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("m"))
      g.select(col("l_suppkey"), col("m"), col("n"), col("sx"),
          col("band"),
          lead(col("m"), 1).over(w).as("m_next"),
          lead(col("n"), 1).over(w).as("n_next"),
          lead(col("sx"), 1).over(w).as("sx_next"),
          lead(col("band"), 1).over(w).as("band_next"))
        .filter(col("band") && col("band_next") &&
          col("m_next") === col("m") + 1)
        .select(col("l_suppkey"), col("m").cast("int").as("m"),
          col("n").as("n1"),
          (col("sx").cast("double") / col("n")).as("mean1"),
          col("n_next").as("n2"),
          (col("sx_next").cast("double") / col("n_next")).as("mean2"))
        .orderBy(col("l_suppkey"), col("m"))
    }),

    // --- TPC-DS q54's revenue-band customer histogram: customers who
    // bought a target part segment in a seed month, their revenue over
    // the following quarter, bucketed into $50k bands with a customer
    // count per band. Scale shape: my_customers is a DISTINCT on the
    // bare custkey after two narrow joins (part prune rides a LEFT SEMI
    // — part is scale-proportional, no broadcast hint, AQE sizes the
    // build side); the quarter revenue re-joins the fact ONCE, pruned
    // by a semi join on the small qualifying-customer set; the final
    // histogram is a groupBy on the already-tiny per-customer rollup.
    // Bands are exact: per-row cents (2-dp money ×100 in DECIMAL) and
    // `div 5000000` BIGINT integer division — no FP anywhere.
    // Ref: /root/reference/benchmark/tpcds/query54.tpl ---
    "ds18_revenue_bands" -> ((s, dir) => {
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val p = Tables.load(s, dir, "part")
        .filter(col("p_type").isin("PROMO", "ECONOMY"))
        .select(col("p_partkey"))
      val seedOrders = o
        .filter(col("o_orderdate") >= lit("1997-03-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val myCust = l.select(col("l_orderkey"), col("l_partkey"))
        .join(p, col("l_partkey") === col("p_partkey"), "left_semi")
        .join(seedOrders, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey")).distinct()
      val qtrOrders = o
        .filter(col("o_orderdate") >= lit("1997-04-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
        .join(myCust, Seq("o_custkey"), "left_semi")
      val rev = l
        .select(col("l_orderkey"),
          (col("l_extendedprice").cast(DecimalType(28, 2)) * lit(100))
            .cast("bigint").as("cents"))
        .join(qtrOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("cents")).as("rev_c"))
      rev
        .select(expr("rev_c div 5000000").cast("int").as("segment"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("num_customers"))
        .withColumn("segment_base_usd", (col("segment") * 50000).cast("int"))
        .orderBy(col("segment"))
    }),

    // --- TPC-DS q59's week-over-week day-of-week pivot: per (store →
    // nation, week) revenue split across weekdays, each week compared
    // against the SAME week one year (52 weeks) later. The calendar is
    // pure integer arithmetic — absolute week = days-since-epoch div 7
    // (q59's d_week_seq), dow = (days+4) mod 7 — so no ISO-week or
    // locale semantics can diverge between engines. The template's
    // year1⋈year2 self-join of the pivoted CTE is re-expressed as ONE
    // conditional aggregation: each row lands on the pair key
    // week_seq − 52·(yr−1997), so both years of a pair meet in the same
    // group and the fact is scanned ONCE (the self-join spelling scans
    // it twice). Ratios are exact integer ppm (non-negative cents, so
    // floor-div == trunc-div in both engines); tot1·1e6 stays under
    // Long.Max while a nation-week stays under ~9e12 cents ($9e10).
    // Ref: /root/reference/benchmark/tpcds/query59.tpl ---
    "ds19_wow_dow_pivot" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"),
          unix_date(col("o_orderdate").cast("date")).cast("bigint")
            .as("ud"),
          year(col("o_orderdate")).as("yr"),
          (col("o_totalprice").cast(DecimalType(28, 2)) * lit(100))
            .cast("bigint").as("cents"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("nat"))
      def cell(y: Int, dow: Int) =
        sum(when(col("yr") === y && pmod(col("ud") + 4, lit(7)) === dow,
          col("cents")).otherwise(0L))
      def ppm(a: String, b: String) =
        expr(s"CASE WHEN $a > 0 THEN $b * 1000000 div $a END")
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("nat"),
          (expr("ud div 7") - lit(52) * (col("yr") - 1997)).as("wk"))
        .agg(cell(1997, 0).as("sun1"), cell(1998, 0).as("sun2"),
          cell(1997, 3).as("wed1"), cell(1998, 3).as("wed2"),
          cell(1997, 6).as("sat1"), cell(1998, 6).as("sat2"),
          sum(when(col("yr") === 1997, col("cents")).otherwise(0L))
            .as("tot1"),
          sum(when(col("yr") === 1998, col("cents")).otherwise(0L))
            .as("tot2"))
        .filter(col("tot1") > 0 && col("tot2") > 0)
        .select(col("nat"), col("wk"),
          ppm("sun1", "sun2").as("sun_ppm"),
          ppm("wed1", "wed2").as("wed_ppm"),
          ppm("sat1", "sat2").as("sat_ppm"),
          expr("tot2 * 1000000 div tot1").as("tot_ppm"))
        .orderBy(col("nat"), col("wk"))
    }),

    // --- TPC-DS q75's declining-brands report: per-brand net activity
    // (sales minus returns — the template's three-channel UNION of
    // sales-less-returns, here one fact with returnflag R as the
    // returns channel) for two consecutive years, keeping brands whose
    // net quantity DROPPED. The year self-join is again a conditional
    // aggregation (one shuffle, fact scanned once); quantities and
    // cents are signed BIGINTs, the decline test and deltas are exact
    // integer subtraction.
    // Ref: /root/reference/benchmark/tpcds/query75.tpl ---
    "ds20_declining_brands" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), year(col("o_orderdate")).as("yr"))
      val l = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_quantity").cast("bigint").as("qty"),
          (col("l_extendedprice").cast(DecimalType(28, 2)) * lit(100))
            .cast("bigint").as("cents"),
          when(col("l_returnflag") === "R", -1L).otherwise(1L).as("sgn"))
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      def cell(y: Int, c: Column) =
        sum(when(col("yr") === y, col("sgn") * c).otherwise(0L))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(cell(1997, col("qty")).as("q1"),
          cell(1998, col("qty")).as("q2"),
          cell(1997, col("cents")).as("r1"),
          cell(1998, col("cents")).as("r2"))
        .filter(col("q2") < col("q1"))
        .select(col("p_brand"), col("q1"), col("q2"),
          (col("q1") - col("q2")).as("qty_drop"),
          (col("r1") - col("r2")).as("rev_drop_cents"))
        .orderBy(col("qty_drop").desc, col("p_brand"))
    }),

    // --- TPC-DS q34/q73's frequent-buyer band: orders whose item count
    // sits in a band (8..12 — the synthetic corpus tops out at ~13
    // lines per order), listed with their customers. The band is a
    // HAVING on the per-order count BEFORE any dimension join — the
    // fact aggregates to one row per order first, so the customer join
    // sees only band survivors. All-integer — hash-exact.
    // Ref: /root/reference/benchmark/tpcds/query34.tpl ---
    "ds21_frequent_buyers" -> ((s, dir) => {
      val cnt = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .filter(col("n_items") >= 8 && col("n_items") <= 12)
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"))
      cnt.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("n_items"))
        .orderBy(col("n_items").desc, col("c_custkey"), col("o_orderkey"))
    }),

    // --- TPC-DS q31's quarter-over-quarter growth-rate compare between
    // two channels per geography: nations where the w-channel grew
    // FASTER from Q2 to Q3 than the s-channel. Same conditional-
    // aggregation collapse as ds16 (the template self-joins six
    // quarterly CTEs; here the four (chan, quarter) cells are CASE sums
    // in ONE shuffle on the nation grain) and the growth-rate
    // comparison w3/w2 > s3/s2 is the exact cross-product
    // w3·s2 > s3·w2 over per-row-derived cents — zero FP. Unlike
    // ds16's per-CUSTOMER cells, a nation-quarter cell is
    // corpus-proportional (~3.7e9 cents at sf0.1 → the product tops
    // 9.9e18 and overflows INT64), so the compare runs in
    // DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact to 1e38, and
    // DuckDB RAISES rather than wraps, which is how this was caught at
    // sf0.1. The two-quarter band is a pushable timestamp range.
    // Ref: /root/reference/benchmark/tpcds/query31.tpl ---
    "ds22_growth_compare" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-04-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select(col("o_custkey"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "s")
            .otherwise("w").as("chan"),
          quarter(col("o_orderdate")).as("q"),
          (col("o_totalprice").cast(DecimalType(28, 2)) * lit(100))
            .cast("bigint").as("cents"))
      val c = Tables.load(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("nat"))
      def cell(ch: String, q: Int) =
        sum(when(col("chan") === ch && col("q") === q, col("cents"))
          .otherwise(0L))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("nat"))
        .agg(cell("s", 2).as("s2"), cell("s", 3).as("s3"),
          cell("w", 2).as("w2"), cell("w", 3).as("w3"))
        .filter(col("s2") > 0 && col("w2") > 0 &&
          col("s3") > 0 && col("w3") > 0 &&
          col("w3").cast(DecimalType(38, 0)) *
            col("s2").cast(DecimalType(38, 0)) >
          col("s3").cast(DecimalType(38, 0)) *
            col("w2").cast(DecimalType(38, 0)))
        .orderBy(col("nat"))
    }),

    // --- TPC-DS q41's combinatorial attribute fan: DISTINCT part
    // attributes under an OR-of-ANDs predicate, restricted by EXISTS to
    // parts that actually moved in bulk. The boolean fan is a scan-side
    // predicate (each disjunct is sargable; Catalyst pushes the whole
    // disjunction); the EXISTS is a LEFT SEMI against a
    // quantity-pruned lineitem scan — the dimension never fans out.
    // All string/integer — hash-exact.
    // Ref: /root/reference/benchmark/tpcds/query41.tpl ---
    "ds23_attribute_fan" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(
          (col("p_type") === "PROMO" &&
            col("p_size").between(1, 15)) ||
          (col("p_type") === "ECONOMY" &&
            col("p_size").between(16, 30)) ||
          (col("p_type") === "STANDARD" &&
            col("p_size").between(31, 50)))
      val bulk = Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") >= 40)
        .select(col("l_partkey"))
      p.join(bulk, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_name"), col("p_brand"), col("p_size"))
        .distinct()
        .orderBy(col("p_name"), col("p_brand"), col("p_size"))
    }),

    // --- TPC-DS q47/q57's moving-deviation selection: per-(brand, month)
    // quantity vs the brand's yearly mean, keeping cells >10% off the
    // mean, with the neighbor months (lag/lead) carried alongside — the
    // template's v1_lag/v1_lead self-joins re-expressed as offset windows
    // over the AGGREGATED grid. The deviation test is integer-exact
    // (|12·q − Σyear|·10 > Σyear ⟺ |q − Σ/12| > 0.1·Σ/12 — no division,
    // no FP); the only double in the output is the single BIGINT→double
    // division for the displayed mean. Scale shape: ONE shuffle to the
    // (brand, month) grain with partial agg; every window partitions by
    // brand over ≤12 month rows (bounded frame); the year band is a
    // pushed timestamp range. Ref: /root/reference/benchmark/tpcds/
    // query47.tpl, query57.tpl ---
    "ds24_cyclic_deviation" -> ((s, dir) => {
      val g = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), month(col("l_shipdate")).as("m"))
        .agg(sum(col("l_quantity").cast("bigint")).as("q"))
      // bounded frames: ≤12 rows per brand on the aggregated grid
      val wb = Window.partitionBy(col("p_brand"))
      val wo = Window.partitionBy(col("p_brand")).orderBy(col("m"))
      g.select(col("p_brand"), col("m"), col("q"),
          sum(col("q")).over(wb).as("yr"),
          count(lit(1)).over(wb).as("nm"),
          lag(col("q"), 1).over(wo).as("prev_q"),
          lead(col("q"), 1).over(wo).as("next_q"))
        .filter(col("nm") === 12 &&
          abs(lit(12L) * col("q") - col("yr")) * lit(10L) > col("yr"))
        .select(col("p_brand"), col("m"), col("q"),
          col("prev_q"), col("next_q"),
          (col("yr").cast("double") / col("nm").cast("double")).as("avg_q"))
        .orderBy(col("p_brand"), col("m"))
    }),

    // --- TPC-DS q49's worst-return-ratios: per channel, rank items by
    // quantity-return ratio AND by amount-return ratio, keep anything in
    // either top-10. Channel ≈ l_linestatus, item ≈ brand, return ≈
    // l_returnflag = 'R'. Amounts ride as per-row-derived BIGINT
    // micro-units (the h11 convention); each ratio is ONE BIGINT→double
    // division (IEEE-identical cross-engine), ranked with a brand
    // tiebreak. Scale shape: one scan, one shuffle to the
    // (channel, brand) grain; both rank windows partition by channel
    // over ≤#brands rows (bounded grid — the dual rank never touches
    // fact rows). Ref: /root/reference/benchmark/tpcds/query49.tpl ---
    "ds25_return_ratios" -> ((s, dir) => {
      val mu = (col("l_extendedprice").cast(DecimalType(28, 6)) *
        lit(1000000)).cast("bigint")
      val qn = col("l_quantity").cast("bigint")
      val isR = col("l_returnflag") === "R"
      val agg = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_linestatus").as("channel"), col("p_brand"))
        .agg(
          sum(when(isR, qn).otherwise(lit(0L))).as("ret_q"),
          sum(qn).as("sold_q"),
          sum(when(isR, mu).otherwise(lit(0L))).as("ret_amt"),
          sum(mu).as("sold_amt"))
        .withColumn("qty_ratio",
          col("ret_q").cast("double") / col("sold_q").cast("double"))
        .withColumn("amt_ratio",
          col("ret_amt").cast("double") / col("sold_amt").cast("double"))
      val wq = Window.partitionBy(col("channel"))
        .orderBy(col("qty_ratio").desc, col("p_brand"))
      val wa = Window.partitionBy(col("channel"))
        .orderBy(col("amt_ratio").desc, col("p_brand"))
      agg
        .withColumn("rnk_qty", rank().over(wq))
        .withColumn("rnk_amt", rank().over(wa))
        .filter(col("rnk_qty") <= 10 || col("rnk_amt") <= 10)
        .select(col("channel"), col("p_brand"),
          col("qty_ratio"), col("amt_ratio"),
          col("rnk_qty"), col("rnk_amt"))
        .orderBy(col("channel"), col("rnk_qty"), col("rnk_amt"),
          col("p_brand"))
    }),

    // --- TPC-DS q17's three-channel quantity statistics: per brand, the
    // count/sum/sum-of-squares moments of quantity in each returnflag
    // channel (N/A/R ≈ the template's store/catalog/web quantity triple),
    // restricted to brands with return activity. The template's stdev
    // outputs are FP-hazardous cross-engine, so the moments ship as exact
    // BIGINTs (the ds17 convention) — any consumer can derive
    // mean/variance from them. ONE conditional-aggregation scan instead
    // of the template's three channel self-joins; the two-year band is a
    // pushed timestamp range. Ref: /root/reference/benchmark/tpcds/
    // query17.tpl ---
    "ds26_channel_stats" -> ((s, dir) => {
      val qn = col("l_quantity").cast("bigint")
      def chan(f: String, v: Column): Column =
        sum(when(col("l_returnflag") === f, v).otherwise(lit(0L)))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          chan("N", lit(1L)).as("n_cnt"),
          chan("N", qn).as("n_sum"),
          chan("N", qn * qn).as("n_sum2"),
          chan("A", lit(1L)).as("a_cnt"),
          chan("A", qn).as("a_sum"),
          chan("A", qn * qn).as("a_sum2"),
          chan("R", lit(1L)).as("r_cnt"),
          chan("R", qn).as("r_sum"),
          chan("R", qn * qn).as("r_sum2"))
        .filter(col("r_cnt") > 0)
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q38/q87's n-way INTERSECT: customers active in ALL
    // THREE consecutive quarters, counted. Catalyst rewrites each
    // INTERSECT to a left-semi join over the distinct key — three
    // window-pruned scans of the SAME table narrowing left to right
    // (the second and third probes see only survivors). Each quarter
    // band is a pushed timestamp range; the count is the only final
    // row. Ref: /root/reference/benchmark/tpcds/query38.tpl,
    // query87.tpl ---
    "ds27_triple_intersect" -> ((s, dir) => {
      def q(lo: String, hi: String) = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(lo).cast("timestamp"))
        .filter(col("o_orderdate") < lit(hi).cast("timestamp"))
        .select(col("o_custkey"))
      q("1997-01-01", "1997-04-01")
        .intersect(q("1997-04-01", "1997-07-01"))
        .intersect(q("1997-07-01", "1997-10-01"))
        .agg(count(lit(1)).cast("bigint").as("n_loyal"))
    }),

    // --- TPC-DS q65's below-half-average selection: per-(nation, brand)
    // revenue kept where it is ≤ half the nation's average brand
    // revenue. The template's correlated avg subquery decorrelates to a
    // per-nation (total, count) aggregate OVER the already-reduced
    // (nation, brand) grid — bounded rows — re-entering by equi-join;
    // the ≤ half-average test is the exact cross-multiplication
    // rev·2·nb ≤ total in DECIMAL(38,0)/HUGEINT (cents × brand-count
    // exceeds INT64 at corpus scale — the ds22 lesson applied
    // up-front). Revenue rides per-row-derived BIGINT cents.
    // Ref: /root/reference/benchmark/tpcds/query65.tpl ---
    "ds28_below_avg_brands" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val rev = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("c_nationkey").as("nat"), col("p_brand"))
        .agg(sum(cents).cast("bigint").as("rev_c"))
      val avgRev = rev.groupBy(col("nat").as("a_nat"))
        .agg(sum(col("rev_c")).cast("bigint").as("total_c"),
          count(lit(1)).as("nb"))
      rev.join(avgRev, col("nat") === col("a_nat"))
        .filter(col("rev_c").cast(D38) * lit(2L) * col("nb").cast(D38) <=
          col("total_c").cast(D38))
        .select(col("nat"), col("p_brand"), col("rev_c"))
        .orderBy(col("nat"), col("p_brand"))
    }),

    // --- TPC-DS q10/q35's OR-of-EXISTS gate: customers active in a
    // window AND satisfying EITHER of two independent existence checks
    // (a returned lineitem anywhere, or any jumbo order). The
    // disjunction of correlated EXISTS cannot be one semi-join, so it
    // is spelled scale-honestly as TWO left-semi probes over the
    // distinct active set UNIONed then re-DISTINCTed — each probe is an
    // equi-join on the bare key, no correlated per-row subquery
    // survives. Demographic rollup = one ≤|segments| aggregate.
    // Ref: /root/reference/benchmark/tpcds/query10.tpl, query35.tpl,
    // query69.tpl (the NOT-EXISTS-arm variant of the same profile) ---
    "ds29_or_exists_profile" -> ((s, dir) => {
      val active = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_custkey")).distinct()
      val returned = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R"),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_custkey"))
      val jumbo = Tables.load(s, dir, "orders")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_custkey"))
      val flagged = active
        .join(returned, Seq("o_custkey"), "left_semi")
        .union(active.join(jumbo, Seq("o_custkey"), "left_semi"))
        .distinct()
      flagged
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("bigint").as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- TPC-DS q13/q48's demographic OR-of-ANDs over MEASURES: one
    // ungrouped aggregate under a three-branch disjunction, each branch
    // a conjunction across TWO dimensions plus a fact band — unlike
    // ds23 (attribute DISTINCT), the disjunction here gates SUMS. No
    // branch is scan-pushable (each needs the joined row), so the
    // filter sits post-join while the joins stay pure equi; amounts
    // ride per-row BIGINT cents. Ref: /root/reference/benchmark/tpcds/
    // query13.tpl, query48.tpl, query85.tpl (the returns-side
    // triple-OR of the same conjunction-bundle signature) ---
    "ds30_demographic_bands" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .filter(
          (col("c_mktsegment") === "BUILDING" &&
            col("o_orderstatus") === "F" &&
            col("l_quantity").between(10, 30)) ||
          (col("c_mktsegment") === "MACHINERY" &&
            col("o_orderstatus") === "O" &&
            col("l_quantity").between(20, 40)) ||
          (col("c_mktsegment") === "AUTOMOBILE" &&
            col("o_orderpriority") === "1-URGENT" &&
            col("l_quantity") < 15))
        .agg(count(lit(1)).cast("bigint").as("n"),
          sum(col("l_quantity").cast("bigint")).cast("bigint")
            .as("sum_qty"),
          sum(cents).cast("bigint").as("sum_cents"))
    }),

    // --- TPC-DS q1/q30/q81's above-average-returns: customers whose
    // total return value exceeds 1.2× their nation's average. The
    // template's correlated scalar subquery decorrelates to a
    // per-nation (total, count) aggregate over the already-reduced
    // (nation, customer) grid, re-entering by equi-join; 1.2× is the
    // exact cross-multiplication ret·5·nc > total·6 in
    // DECIMAL(38,0)/HUGEINT (cents × customer-count is
    // corpus-proportional — the ds22 lesson). The returnflag filter
    // prunes the fact scan. Ref: /root/reference/benchmark/tpcds/
    // query1.tpl, query30.tpl, query81.tpl ---
    "ds31_return_outliers" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val ret = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nat"), col("o_custkey").as("cust"))
        .agg(sum(cents).cast("bigint").as("ret_c"))
      val natAvg = ret.groupBy(col("nat").as("a_nat"))
        .agg(sum(col("ret_c")).cast("bigint").as("total_c"),
          count(lit(1)).as("nc"))
      ret.join(natAvg, col("nat") === col("a_nat"))
        .filter(col("ret_c").cast(D38) * lit(5L) * col("nc").cast(D38) >
          col("total_c").cast(D38) * lit(6L))
        .select(col("nat"), col("cust"), col("ret_c"))
        .orderBy(col("nat"), col("cust"))
    }),

    // --- TPC-DS q44's double-sided rank: best AND worst performers in
    // one pass — two opposite-direction ranks over the SAME aggregated
    // grid, top-5 of each UNIONed with a side tag. The windows are
    // unpartitioned by the template's nature but run over the ≤|brands|
    // aggregated frame (bounded — the sanctioned exception), never fact
    // rows. Ref: /root/reference/benchmark/tpcds/query44.tpl ---
    "ds32_best_worst" -> ((s, dir) => {
      val perf = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity").cast("bigint")).cast("bigint").as("q"))
      // bounded frame: ≤|brands| rows post-aggregation
      val best = Window.orderBy(col("q").desc, col("p_brand"))
      val worst = Window.orderBy(col("q").asc, col("p_brand"))
      val rk = perf
        .withColumn("best_rnk", rank().over(best))
        .withColumn("worst_rnk", rank().over(worst))
      rk.filter(col("best_rnk") <= 5)
        .select(lit("best").as("side"), col("best_rnk").as("rnk"),
          col("p_brand"), col("q"))
        .unionAll(rk.filter(col("worst_rnk") <= 5)
          .select(lit("worst").as("side"), col("worst_rnk").as("rnk"),
            col("p_brand"), col("q")))
        .orderBy(col("side"), col("rnk"), col("p_brand"))
    }),

    // --- TPC-DS q58's cross-channel equality band: items whose revenue
    // is within ~30% across ALL THREE channels (returnflag classes ≈
    // the template's store/catalog/web). One conditional-aggregation
    // scan to the brand grain; every pairwise band test is the exact
    // cross-multiplication x·10 ≤ y·13 in DECIMAL(38,0)/HUGEINT — six
    // comparisons, zero FP. Ref: /root/reference/benchmark/tpcds/
    // query58.tpl ---
    "ds33_channel_band" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      def chanSum(f: String): Column =
        sum(when(col("l_returnflag") === f, cents).otherwise(lit(0L)))
          .cast("bigint")
      val rev = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(chanSum("N").as("n_c"), chanSum("A").as("a_c"),
          chanSum("R").as("r_c"))
      def within(x: Column, y: Column): Column =
        x.cast(D38) * lit(10L) <= y.cast(D38) * lit(13L) &&
          y.cast(D38) * lit(10L) <= x.cast(D38) * lit(13L)
      rev.filter(col("n_c") > 0 && col("a_c") > 0 && col("r_c") > 0 &&
          within(col("n_c"), col("a_c")) &&
          within(col("n_c"), col("r_c")) &&
          within(col("a_c"), col("r_c")))
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q90's am/pm ratio: two time-band conditional counts in
    // ONE scan and a single BIGINT→double division — the template's two
    // scalar subqueries fused (the ds6 treatment applied to q90).
    // Ref: /root/reference/benchmark/tpcds/query90.tpl; query71.tpl's
    // hour-of-day breakdown rides the same derived-hour grain ---
    "ds34_am_pm_ratio" -> ((s, dir) => {
      graft.Tables.events(s, dir)
        .filter(col("event_type").isin("view", "click"))
        .agg(
          sum(when(hour(col("t")) < 12, 1L).otherwise(0L)).cast("bigint")
            .as("am_cnt"),
          sum(when(hour(col("t")) >= 12, 1L).otherwise(0L)).cast("bigint")
            .as("pm_cnt"))
        .select(col("am_cnt"), col("pm_cnt"),
          (col("am_cnt").cast("double") / col("pm_cnt").cast("double"))
            .as("am_pm_ratio"))
    }),

    // --- TPC-DS q92/q32's excess-discount: lineitems whose discount
    // exceeds 1.3× their ITEM's average discount. The correlated avg
    // subquery decorrelates to a per-partkey (total, count) aggregate
    // re-entering by equi-join; 1.3× is the exact cross-multiplication
    // disc·10·nl > total·13 in DECIMAL(38,0)/HUGEINT over basis-point
    // integers (per-row ×10⁴ — exact for the 4-dp discount domain).
    // Ref: /root/reference/benchmark/tpcds/query92.tpl, query32.tpl ---
    "ds35_excess_discount" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val d = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_discount").cast(DecimalType(18, 4)) * lit(10000))
            .cast("bigint").as("disc_bp"))
      val avgD = d.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("disc_bp")).cast("bigint").as("tot_bp"),
          count(lit(1)).as("nl"))
      d.join(avgD, col("l_partkey") === col("pk"))
        .filter(col("disc_bp").cast(D38) * lit(10L) * col("nl").cast(D38) >
          col("tot_bp").cast(D38) * lit(13L))
        .agg(count(lit(1)).cast("bigint").as("n_excess"),
          sum(col("disc_bp")).cast("bigint").as("sum_excess_bp"))
    }),

    // --- TPC-DS q51's cumulative channel compare: per (item, month),
    // the running web total vs the running store total, keeping months
    // where web's cume leads. Channels ≈ returnflag A (web) / N
    // (store). The template computes each channel's cume over its OWN
    // date grid, FULL-OUTER joins them, and carry-forwards with a
    // running max; here both channels ride ONE scan as conditional
    // sums on the unified (item, month) grid — the carry-forward is
    // sum-of-coalesced with a count()>0 null gate, which reproduces the
    // outer-join + running-max semantics exactly (NULL before a
    // channel's first active month, carried cume after). Money is
    // BIGINT micros; per-item cumes are entity-bounded (≤12 month rows
    // per item — bounded window frames; the grid shuffle is the single
    // exchange). Oracle keeps the template's two-CTE FULL OUTER
    // spelling, so the pass doubles as an equivalence proof.
    // Ref: /root/reference/benchmark/tpcds/query51.tpl ---
    "ds36_cumulative_compare" -> ((s, dir) => {
      val mu = (col("l_extendedprice").cast(DecimalType(28, 6)) *
        lit(1000000)).cast("bigint")
      val g = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .filter(col("l_returnflag").isin("A", "N"))
        .groupBy(col("l_partkey").as("item"),
          date_trunc("month", col("l_shipdate")).as("m"))
        .agg(sum(when(col("l_returnflag") === "A", mu)).as("a_s"),
          sum(when(col("l_returnflag") === "N", mu)).as("n_s"))
      val w = Window.partitionBy(col("item")).orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.select(col("item"), col("m"), col("a_s"), col("n_s"),
          sum(coalesce(col("a_s"), lit(0L))).over(w).as("ca"),
          count(col("a_s")).over(w).as("na"),
          sum(coalesce(col("n_s"), lit(0L))).over(w).as("cb"),
          count(col("n_s")).over(w).as("nb"))
        .select(col("item"), col("m"),
          when(col("a_s").isNotNull, col("ca")).as("web_sales"),
          when(col("n_s").isNotNull, col("cb")).as("store_sales"),
          when(col("na") > 0, col("ca")).as("web_cumulative"),
          when(col("nb") > 0, col("cb")).as("store_cumulative"))
        .filter(col("web_cumulative") > col("store_cumulative"))
        .orderBy(col("item"), col("m"))
        .limit(100)
    }),

    // --- TPC-DS q89's monthly-deviation band over a category grid:
    // monthly sales per (type, brand, nation) cell vs the cell's yearly
    // monthly mean, keeping months >10% off the mean — ds24's
    // integer-exact machinery (|s·nm − Σ|·10 > Σ·nm, no division) at
    // q89's grain, with the template's OR-of-(category, class) gate on
    // the item dim and the deviation-ordered LIMIT page. The order key
    // is the one place a double appears — (s·nm − Σ) exact in
    // DECIMAL(38,0) first, then a single ÷nm in IEEE double, identical
    // cross-engine. Scale: gate + year band pushed to the scans, ONE
    // shuffle to the constant-cardinality grid, windows partition over
    // ≤12-month frames. Ref: /root/reference/benchmark/tpcds/
    // query89.tpl ---
    "ds37_monthly_deviation" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val mu = (col("l_extendedprice").cast(DecimalType(28, 6)) *
        lit(1000000)).cast("bigint")
      val p = Tables.load(s, dir, "part")
        .filter((col("p_type").isin("SMALL", "LARGE") &&
            col("p_brand").isin("Brand#1", "Brand#3", "Brand#5")) ||
          (col("p_type").isin("ECONOMY", "PROMO") &&
            col("p_brand").isin("Brand#2", "Brand#4")))
      val n = broadcast(Tables.load(s, dir, "nation"))
      val g = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("p_type"), col("p_brand"), col("n_name"),
          month(col("l_shipdate")).as("mo"))
        // accumulate in DECIMAL(38,0); present via the guarded cast so
        // an over-SF1k total raises instead of wrapping (Present scaladoc)
        .agg(Present.bigintExact(sum(mu.cast(D38)), "ds37.s").as("s"))
      val wb = Window.partitionBy(col("p_type"), col("p_brand"),
        col("n_name"))
      g.select(col("p_type"), col("p_brand"), col("n_name"), col("mo"),
          col("s"), sum(col("s").cast(D38)).over(wb).as("tot"),
          count(lit(1)).over(wb).as("nm"))
        .filter(abs(col("s").cast(D38) * col("nm") - col("tot").cast(D38)) *
          lit(10L) > col("tot").cast(D38) * col("nm"))
        .select(col("p_type"), col("p_brand"), col("n_name"), col("mo"),
          col("s"), (col("tot").cast("double") / col("nm").cast("double"))
            .as("avg_monthly"))
        .orderBy(((col("s").cast(D38) * col("nm") - col("tot").cast(D38))
            .cast("double") / col("nm").cast("double")).asc,
          col("n_name"), col("p_type"), col("p_brand"), col("mo"))
        .limit(100)
    }),

    // --- TPC-DS q70's region ranking with grouping sets: profit rolled
    // up over the (nation, city) hierarchy restricted to the top-5
    // nations, with GROUPING()-derived level and rank-within-parent.
    // State ≈ nation (25 by spec), county ≈ the SSB city derivation
    // (nation prefix + supplier-key digit — 250 values by
    // construction), so every rollup level and every rank partition is
    // BOUNDED: the grand total (1 row), the ≤5 nation subtotals, and
    // ≤10 cities per nation. The top-5 gate is an aggregate-then-rank
    // over the 25-nation grid joined back LEFT SEMI (never a collect).
    // Profit = cents·(10⁴−disc_bp) micro-dollars — per-row exact BIGINT
    // — summed in DECIMAL(38,0) because nation totals are
    // corpus-proportional (the r13 ds22 overflow lesson).
    // r17: the ORACLE is respelled so it contains ONLY constructs the
    // driver's DuckDB has proven green elsewhere — the top5 aggregate is
    // materialized in a CTE before its window (no aggregate inside
    // OVER's ORDER BY at GROUP-BY level, the r15/r16 exotic-binding
    // class) and ROLLUP becomes a UNION ALL of the three plain GROUP
    // BYs with literal lochierarchy. The Spark side below is unchanged:
    // rollup IS the operator under test; the oracle only needs to be
    // equivalent, not symmetrical.
    // r18: two presentation-layer changes, after the r15–r17 construct
    // eliminations exhausted the SQL-level hypotheses (ledger in
    // PLANS.md §ds38):
    //   (1) total_sum is presented as BIGINT. ds38 was one of only TWO
    //       registry queries whose OUTPUT carried a decimal column, and
    //       the only one where the decimal's string rendering is
    //       read-path-dependent: DuckDB 1.0.0's fetchdf() renders
    //       DECIMAL(38,0) as float64 ("157125763296900.0") while
    //       fetchall()/pyarrow keep Decimal ("157125763296900") — an
    //       asymmetry a hash-compare driver can hit and a same-connection
    //       local compare (tools/check.py) structurally cannot. The
    //       ROLLUP still ACCUMULATES in DECIMAL(38,0) (the r13 ds22
    //       overflow lesson); only the 34-row presentation narrows, in
    //       the ds37/ds39 sibling convention (BIGINT micro-dollars hold
    //       to ~SF1k; widen the presentation per deployment beyond).
    //   (2) the rank partition key uses the sentinel '*' instead of
    //       CAST(NULL AS VARCHAR) for rollup levels 1–2 — it was the
    //       registry's only NULL-literal window partition key; nations
    //       are never named '*', so partitions are unchanged.
    // r19: the TEMPORARY ds38a–f stage diagnostics did their job in one
    // driver evaluation (ds38 green + f red = the predicted read-path
    // signature) and were removed per their exit contract; the durable
    // protections are the registry-wide zero-decimal-output lint and the
    // PLANS.md §ds38 ledger.
    // Ref: /root/reference/benchmark/tpcds/query70.tpl ---
    "ds38_rank_rollup" -> ((s, dir) => {
      // base/top-5 gate factored into ds38Rows/ds38Kept (the top-5 rank
      // is the sanctioned unpartitioned window over the ≤25-row nation
      // aggregate).
      // Materialize lochierarchy + the parent partition key BEFORE the
      // window (the ds1 convention) and COALESCE the NULL rollup keys to
      // a sentinel (the ds51 discipline): no GROUPING() inside OVER and
      // no engine-specific NULL rendering/ordering can affect the rank.
      val grid = ds38Kept(s, dir)
        .rollup(col("n_name"), col("city"))
        .agg(sum(col("mu")).as("total_sum"),
          grouping(col("n_name")).cast("int").as("gs"),
          grouping(col("city")).cast("int").as("gc"))
        .select(col("total_sum"),
          coalesce(col("n_name"), lit("ALL")).as("state"),
          coalesce(col("city"), lit("ALL")).as("county"),
          (col("gs") + col("gc")).as("lochierarchy"),
          when(col("gc") === 0, col("n_name")).otherwise(lit("*")).as("pk"))
      val wp = Window.partitionBy(col("lochierarchy"), col("pk"))
        .orderBy(col("total_sum").desc, col("state"), col("county"))
      grid.select(
          Present.bigintExact(col("total_sum"), "ds38.total_sum")
            .as("total_sum"),
          col("state"), col("county"),
          col("lochierarchy"),
          rank().over(wp).cast("int").as("rank_within_parent"))
        .orderBy(col("lochierarchy").desc,
          when(col("lochierarchy") === 0, col("state")),
          col("rank_within_parent"), col("state"), col("county"))
    }),

    // --- TPC-DS q23's "frequent items × best customers" gate: total
    // next-half-year sales restricted to items sold in ≥4 distinct
    // orders last year AND customers whose lifetime spend exceeds half
    // the best customer's. The template's three CTEs become three
    // independent aggregates that re-enter as LEFT SEMI probes; the
    // best-customer cut is the exact cross-multiplication
    // cents·100 > max·50 in DECIMAL(38,0) (the ds31 convention — no
    // percentile FP), where max arrives as a broadcast single-row
    // global aggregate. Money = exact cents. Scale: three fact
    // aggregations + one gated scan, every join an equi/semi probe.
    // Ref: /root/reference/benchmark/tpcds/query23.tpl ---
    "ds39_frequent_best" -> ((s, dir) => {
      val D38 = DecimalType(38, 0)
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val li = Tables.load(s, dir, "lineitem")
      val freq = li
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_partkey").as("item"))
        .agg(countDistinct(col("l_orderkey")).as("no"))
        .filter(col("no") >= 4).select(col("item"))
      val spend = li
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("cust"))
        .agg(Present.bigintExact(sum(cents.cast(D38)), "ds39.spent")
          .as("spent"))
      val mx = spend.agg(max(col("spent")).as("m"))
      val best = spend.crossJoin(broadcast(mx))
        .filter(col("spent").cast(D38) * lit(100L) >
          col("m").cast(D38) * lit(50L))
        .select(col("cust"))
      li.filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-07-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(freq, col("l_partkey") === col("item"), "left_semi")
        .join(best, col("o_custkey") === col("cust"), "left_semi")
        .agg(Present.bigintExact(sum(cents.cast(D38)), "ds39.total_cents")
            .as("total_cents"),
          count(lit(1)).cast("bigint").as("n_lines"))
    }),

    // --- TPC-DS q34/q73's frequent-trip groups: orders ("store trips")
    // whose line count falls in a band, then the customers with ≥2
    // such trips. Two stacked HAVING aggregates — (order, customer)
    // grain then customer grain — the per-trip count band can only be
    // evaluated AFTER the first rollup, which is the template's point.
    // All-integer, deterministic top-100 page.
    // Ref: /root/reference/benchmark/tpcds/query34.tpl, query73.tpl ---
    "ds40_trip_band" -> ((s, dir) => {
      val trips = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .join(Tables.load(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .agg(count(lit(1)).as("nl"))
        .filter(col("nl").between(6, 7))
      trips.groupBy(col("o_custkey").as("person"))
        .agg(count(lit(1)).cast("bigint").as("n_trips"),
          sum(col("nl")).cast("bigint").as("n_items"))
        .filter(col("n_trips") >= 2)
        .orderBy(col("n_trips").desc, col("person"))
        .limit(100)
    }),

    // --- TPC-DS q20/q98's revenue share within class: per (type,
    // brand), the 30-day revenue and its percentage of the type's
    // total — the ratio-to-report window. The share divides two exact
    // cent totals in IEEE double (identical expression both engines);
    // the window partitions by p_type over the ≤|brands| aggregated
    // grid (bounded frame). One pushed-range scan, one grid shuffle.
    // Ref: /root/reference/benchmark/tpcds/query20.tpl, query98.tpl,
    // query12.tpl (the family's web-channel twin) ---
    "ds41_class_share" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val g = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-03-31").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_brand"))
        .agg(sum(cents).cast("bigint").as("rev"))
      val w = Window.partitionBy(col("p_type"))
      g.select(col("p_type"), col("p_brand"), col("rev"),
          (col("rev").cast("double") * lit(100.0) /
            sum(col("rev")).over(w).cast("double")).as("revenue_ratio"))
        .orderBy(col("p_type"), col("revenue_ratio").desc, col("p_brand"))
    }),

    // --- TPC-DS q66's shipping pivot: per warehouse (≈ supplier
    // nation), TWELVE monthly totals for each of two ship-mode sets
    // (≈ returnflag N vs not-N) — 24 conditional sums fused into ONE
    // aggregation over one pushed-range scan, where the template
    // spells two UNIONed channel scans each with 24 CASE columns.
    // Exact cents; 25-row output.
    // Ref: /root/reference/benchmark/tpcds/query66.tpl ---
    "ds42_ship_pivot" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val mo = month(col("l_shipdate"))
      val aggs =
        (1 to 12).map(m => sum(when(mo === m &&
            col("l_returnflag") === "N", cents).otherwise(lit(0L)))
          .cast("bigint").as(f"n_m$m%02d")) ++
        (1 to 12).map(m => sum(when(mo === m &&
            col("l_returnflag") =!= "N", cents).otherwise(lit(0L)))
          .cast("bigint").as(f"r_m$m%02d"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q15's zip-gate: quarterly revenue per customer city
    // (zip ≈ the SSB city derivation), where a row qualifies through
    // ANY of a city IN-list, a nation IN-list, or a price floor — the
    // template's signature three-way OR mixing two DIM attributes with
    // a fact MEASURE, so no branch can prune alone and the gate is a
    // post-join row filter by construction. The date band is the only
    // pushed predicate; one grid shuffle; exact cents.
    // Ref: /root/reference/benchmark/tpcds/query15.tpl ---
    "ds43_zip_gate" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val c = Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"),
          concat(col("n_name"), lit("_"),
            (col("c_custkey") % 10).cast("string")).as("city"),
          col("n_name"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-04-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .filter(col("city").isin("NATION_3_7", "NATION_11_3",
            "NATION_20_5") ||
          col("n_name").isin("NATION_1", "NATION_7") ||
          col("l_extendedprice") > 90000)
        .groupBy(col("city"))
        .agg(sum(cents).cast("bigint").as("rev_cents"),
          count(lit(1)).cast("bigint").as("n"))
        .orderBy(col("city"))
    }),

    // --- TPC-DS q62/q99's shipping-lag report: line counts bucketed by
    // days-between-order-and-ship (≤30/60/90/120/more) per priority —
    // the template's five CASE buckets over a datediff, fused into one
    // aggregation over one pushed-range scan. All-integer.
    // Ref: /root/reference/benchmark/tpcds/query62.tpl, query99.tpl ---
    "ds44_ship_lag" -> ((s, dir) => {
      val lagDays = datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date"))
      def bucket(name: String, cond: Column): Column =
        sum(when(cond, 1L).otherwise(0L)).cast("bigint").as(name)
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"), lagDays.as("lag_days"))
        .groupBy(col("o_orderpriority"))
        .agg(bucket("d30", col("lag_days") <= 30),
          bucket("d60", col("lag_days") > 30 && col("lag_days") <= 60),
          bucket("d90", col("lag_days") > 60 && col("lag_days") <= 90),
          bucket("d120", col("lag_days") > 90 && col("lag_days") <= 120),
          bucket("dmore", col("lag_days") > 120))
        .orderBy(col("o_orderpriority"))
    }),

    // --- TPC-DS q43's day-of-week pivot: per supplier nation, seven
    // weekday sales columns as conditional sums on one scan. Spark's
    // dayofweek() is 1-based (Sunday=1) vs DuckDB's 0-based — the −1
    // alignment is part of the oracle contract. Exact cents.
    // Ref: /root/reference/benchmark/tpcds/query43.tpl ---
    "ds45_dow_pivot" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val dow = dayofweek(col("l_shipdate")) - 1
      val aggs = (0 to 6).map(d =>
        sum(when(dow === d, cents).otherwise(lit(0L)))
          .cast("bigint").as(s"dow$d"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q9's bucketed scalar-subquery CASE: the template runs
    // FIFTEEN scalar subqueries (per quantity band: a count probe that
    // decides WHICH of two averages to report). The Spark-first
    // re-expression is ONE conditional-aggregation scan producing all
    // 15 aggregates, with the CASE applied to the single result row —
    // at 100 TB that's 15x less I/O than the textbook plan. The oracle
    // keeps the template's literal scalar-subquery spelling as the
    // equivalence proof. Averages are exact-integer sums divided as
    // DOUBLE at the very end (bit-identical across engines).
    // Ref: /root/reference/benchmark/tpcds/query9.tpl ---
    "ds46_bucket_case" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val bps = (col("l_discount").cast(DecimalType(28, 4)) *
        lit(10000)).cast("bigint")
      val bands = Seq((1, 10), (10, 20), (20, 30), (30, 40), (40, 50))
      val thresholds = Seq(11100L, 11950L, 12000L, 11900L, 11900L)
      val aggs = bands.zipWithIndex.flatMap { case ((lo, hi), i) =>
        val in = col("l_quantity") > lo && col("l_quantity") <= hi
        Seq(
          sum(when(in, 1L).otherwise(0L)).cast("bigint").as(s"cnt$i"),
          sum(when(in, cents).otherwise(lit(0L))).cast("bigint")
            .as(s"pc$i"),
          sum(when(in, bps).otherwise(lit(0L))).cast("bigint")
            .as(s"db$i"))
      }
      val one = Tables.load(s, dir, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
      // Empty-band guard (ADVICE r15): 0/0 would be NaN here while the
      // oracle's scalar subqueries return NULL on an empty band — emit
      // NULL so the engines agree even if a fixture scale ever leaves a
      // quantity band unpopulated.
      val buckets = bands.indices.map { i =>
        when(col(s"cnt$i") === 0L, lit(null).cast("double"))
          .when(col(s"cnt$i") > thresholds(i),
            col(s"pc$i").cast("double") / col(s"cnt$i").cast("double"))
          .otherwise(
            col(s"db$i").cast("double") / col(s"cnt$i").cast("double"))
          .as(s"bucket${i + 1}")
      }
      one.select(buckets: _*)
    }),

    // --- TPC-DS q2's week-over-year pivot ratio: weekly day-of-week
    // sales pivots for two consecutive years, self-joined on week
    // number, reporting per-weekday year-over-year ratios. ONE scan
    // builds both years' pivots (year is just another group key); the
    // self-join runs over the ~50-row aggregated frames, never base
    // rows. ISO weeks 2..51 only, so calendar-year vs ISO-week-year
    // boundary weeks never disagree between engines. Exact cents;
    // ratios are DOUBLE division at the end.
    // Ref: /root/reference/benchmark/tpcds/query2.tpl ---
    "ds47_week_yoy_pivot" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val dow = dayofweek(col("l_shipdate")) - 1
      val pivAggs = (0 to 6).map(d =>
        sum(when(col("dw") === d, col("cents")).otherwise(lit(0L)))
          .cast("bigint").as(s"d$d"))
      val piv = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .select(year(col("l_shipdate")).as("yr"),
          weekofyear(col("l_shipdate")).as("wk"),
          dow.as("dw"), cents.as("cents"))
        .filter(col("wk").between(2, 51))
        .groupBy(col("yr"), col("wk"))
        .agg(pivAggs.head, pivAggs.tail: _*)
      val y1 = piv.filter(col("yr") === 1997)
        .select(col("wk").as("wk1") +:
          (0 to 6).map(d => col(s"d$d").as(s"a$d")): _*)
      val y2 = piv.filter(col("yr") === 1998)
        .select(col("wk").as("wk2") +:
          (0 to 6).map(d => col(s"d$d").as(s"b$d")): _*)
      val ratios = (0 to 6).map(d =>
        when(col(s"a$d") === 0L, lit(null).cast("double"))
          .otherwise(col(s"b$d").cast("double") /
            col(s"a$d").cast("double")).as(s"r$d"))
      y1.join(y2, col("wk1") === col("wk2"))
        .select(col("wk1").as("wk") +: ratios: _*)
        .orderBy(col("wk"))
    }),

    // --- TPC-DS q6's above-category-average gate: parts priced strictly
    // above 1.005x the average retail price of their own p_type (the
    // template's correlated scalar subquery on the dimension; the
    // multiplier is fitted to this corpus's price bands the way the
    // template's 1.2 fits TPC-DS — the sf0.001 fixture spans only
    // [900,920], so anything above ~1.01 empties the smoke scale),
    // then the count of distinct customers per nation who bought such
    // parts in Q2-1997, HAVING >= 2. The 1.005x compare is pure
    // integer cross-multiplication (price*cnt*1000 > sum*1005) — no
    // float averages.
    // The per-type stats live on the DIM (2k rows/SF), computed once
    // and joined back; the fact scan is joined to the pre-gated part
    // list, never to a correlated subquery.
    // Ref: /root/reference/benchmark/tpcds/query6.tpl ---
    "ds48_above_avg_parts" -> ((s, dir) => {
      val pcents = (col("p_retailprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_type"), pcents.as("pc"))
      // No broadcast hints: part is scale-proportional (2k/SF), so the
      // build side is AQE's call from runtime sizes (PlanGuardSpec's
      // corpus-wide hint tripwire applies).
      val stats = p.groupBy(col("p_type"))
        .agg(sum(col("pc")).cast("bigint").as("tsum"),
          count(lit(1)).cast("bigint").as("tcnt"))
      val gated = p.join(stats, "p_type")
        .filter(col("pc") * col("tcnt") * 1000 > col("tsum") * 1005)
        .select(col("p_partkey"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-04-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .join(gated, col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(countDistinct(col("c_custkey")).cast("bigint").as("n_cust"))
        .filter(col("n_cust") >= 2)
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q29/q17/q25's sale->return->repurchase chain: customers
    // who RETURNED a line (returnflag 'R' in an H1-1997 order) and
    // later BOUGHT AGAIN from the same supplier within the year —
    // three fact aliases correlated on (customer, supplier) with a
    // date inequality between the two order arms (supplier is this
    // corpus's repeat-purchase grain; same-part repeats are too rare
    // to exercise the chain). Both arms shuffle on the SAME
    // (custkey, suppkey) grain, so the chain join is one
    // co-partitioned exchange with the date range as a residual —
    // never a cross product; per-(cust,supp) fan is bounded by
    // purchase frequency. Exact quantity cents per supplier nation.
    // Ref: /root/reference/benchmark/tpcds/query29.tpl, query17.tpl,
    // query25.tpl (the net-profit member of the same chain family) ---
    "ds49_return_repurchase" -> ((s, dir) => {
      val qc = (c: Column) =>
        (c.cast(DecimalType(28, 2)) * lit(100)).cast("bigint")
      val o1 = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("o_orderkey").as("ok1"), col("o_custkey").as("ck1"),
          col("o_orderdate").as("d1"))
      val ret = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(o1, col("l_orderkey") === col("ok1"))
        .select(col("ck1"), col("l_suppkey").as("sk1"),
          qc(col("l_quantity")).as("rq"), col("d1"))
      val o2 = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey").as("ok2"), col("o_custkey").as("ck2"),
          col("o_orderdate").as("d2"))
      val buy = Tables.load(s, dir, "lineitem")
        .join(o2, col("l_orderkey") === col("ok2"))
        .select(col("ck2"), col("l_suppkey").as("sk2"),
          qc(col("l_quantity")).as("bq"), col("d2"))
      ret.join(buy, col("ck1") === col("ck2") &&
          col("sk1") === col("sk2") && col("d2") > col("d1"))
        .join(Tables.load(s, dir, "supplier"),
          col("sk1") === col("s_suppkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("bigint").as("n_chains"),
          sum(col("rq")).cast("bigint").as("ret_qty_cents"),
          sum(col("bq")).cast("bigint").as("rebuy_qty_cents"))
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q16/q94/q95's multi-supplier order profile: orders
    // whose lines come from >= 2 DISTINCT suppliers, split into the
    // returned arm (q95: EXISTS a returned line) and the clean arm
    // (q16/q94: NOT EXISTS). The template spells three correlated
    // EXISTS per order; the Spark-first plan is ONE per-order profile
    // aggregation (count distinct suppliers + max return flag on a
    // single lineitem pass) joined to orders — the oracle keeps the
    // EXISTS spelling as the equivalence proof. Single row out.
    // Ref: /root/reference/benchmark/tpcds/query16.tpl, query94.tpl,
    // query95.tpl ---
    "ds50_multi_supplier_split" -> ((s, dir) => {
      val oc = (col("o_totalprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val prof = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("ok"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          max(when(col("l_returnflag") === "R", 1).otherwise(0))
            .as("has_ret"))
      Tables.load(s, dir, "orders")
        .join(prof, col("o_orderkey") === col("ok"))
        .filter(col("nsupp") >= 2)
        // COALESCE to 0 (ADVICE r15): on an input where NO order has
        // >= 2 distinct suppliers, SUM over empty input is NULL while
        // the oracle's COUNT(*)/COALESCE arms return 0 — pin both
        // engines to 0 on the empty qualifying set.
        .agg(
          coalesce(sum(when(col("has_ret") === 1, 1L).otherwise(0L)),
            lit(0L)).cast("bigint").as("n_ret"),
          coalesce(sum(when(col("has_ret") === 1, oc).otherwise(lit(0L))),
            lit(0L)).cast("bigint").as("cents_ret"),
          coalesce(sum(when(col("has_ret") === 0, 1L).otherwise(0L)),
            lit(0L)).cast("bigint").as("n_clean"),
          coalesce(sum(when(col("has_ret") === 0, oc).otherwise(lit(0L))),
            lit(0L)).cast("bigint").as("cents_clean"))
    }),

    // --- TPC-DS q18/q22/q27's multi-measure hierarchy rollup: average
    // order price and average account balance across a three-level
    // (nation, segment, priority) ROLLUP — the templates' list of avg()
    // measures over a demographic hierarchy. Averages are exact-cents
    // sums divided as DOUBLE at the end; rollup NULL keys are
    // COALESCEd to 'ALL' so both engines order the grid identically
    // (Spark sorts NULLs first, DuckDB last — the sentinel removes the
    // divergence). One shuffle; the window-free grid is group-
    // cardinality bounded at any scale.
    // Ref: /root/reference/benchmark/tpcds/query18.tpl, query22.tpl,
    // query27.tpl ---
    "ds51_measure_rollup" -> ((s, dir) => {
      val oc = (col("o_totalprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val ac = (col("c_acctbal").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_mktsegment"),
          col("o_orderpriority"), oc.as("oc"), ac.as("ac"))
        .rollup(col("n_name"), col("c_mktsegment"),
          col("o_orderpriority"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          (sum(col("oc")).cast("double") /
            count(lit(1)).cast("double")).as("avg_price_cents"),
          (sum(col("ac")).cast("double") /
            count(lit(1)).cast("double")).as("avg_bal_cents"))
        .select(coalesce(col("n_name"), lit("ALL")).as("nation"),
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("avg_price_cents"), col("avg_bal_cents"))
        .orderBy(col("nation"), col("segment"), col("priority"))
    }),

    // --- TPC-DS q45's zip-OR-membership gate: a row qualifies through a
    // literal city IN-list OR through membership in an item SUBQUERY
    // (`i_item_id IN (SELECT ...)`) — a disjunction of a local dim
    // predicate and a semi-join, which can neither push nor plan as a
    // plain semi-join. Spark-first: the membership arm becomes a
    // LEFT join against the (tiny, dim-derived) gated key list with a
    // null-test flag, so the OR is a row filter over pure equi-joins —
    // the fact still never multiplies. Exact cents per nation.
    // Ref: /root/reference/benchmark/tpcds/query45.tpl ---
    "ds52_zip_or_items" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val gated = Tables.load(s, dir, "part")
        .filter(col("p_size").isin(11, 17))
        .select(col("p_partkey").as("gpk"))
      val c = Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name"),
          concat(col("n_name"), lit("_"),
            (col("c_custkey") % 10).cast("string")).as("city"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-07-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(gated, col("l_partkey") === col("gpk"), "left")
        .filter(col("city").isin("NATION_2_4", "NATION_9_1",
          "NATION_17_8") || col("gpk").isNotNull)
        .groupBy(col("n_name"))
        .agg(sum(cents).cast("bigint").as("rev_cents"),
          count(lit(1)).cast("bigint").as("n"))
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q83's triple-arm return compare: returned quantity per
    // brand across THREE one-month windows, each arm's share of the
    // three-arm total (the template's sr/cr/wr CTEs joined on item with
    // `qty * 3.0 / total` shares). The three CTE scans fuse into ONE
    // conditional-aggregation pass (pinned); the inner-join semantics
    // (brand present in ALL three arms) become HAVING every arm > 0.
    // Shares are exact-cents divided as DOUBLE at the end.
    // Ref: /root/reference/benchmark/tpcds/query83.tpl ---
    "ds53_return_windows" -> ((s, dir) => {
      val qcents = (col("l_quantity").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      def arm(name: String, lo: String, hi: String): Column =
        sum(when(col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp"), qcents)
          .otherwise(lit(0L))).cast("bigint").as(name)
      val tot = (col("q1") + col("q2") + col("q3")).cast("double")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(arm("q1", "1997-03-01", "1997-04-01"),
          arm("q2", "1997-05-01", "1997-06-01"),
          arm("q3", "1997-07-01", "1997-08-01"))
        .filter(col("q1") > 0 && col("q2") > 0 && col("q3") > 0)
        .select(col("p_brand"), col("q1"), col("q2"), col("q3"),
          (col("q1").cast("double") * 3.0 / tot).as("share1"),
          (col("q2").cast("double") * 3.0 / tot).as("share2"),
          (col("q3").cast("double") * 3.0 / tot).as("share3"))
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q4/q74's cross-channel growth gate: per-customer year
    // totals for two years x two channels (the ds22 priority-derived
    // channel convention), keeping customers whose "web" growth ratio
    // strictly exceeds their "store" growth ratio — the template's
    // year_total CTE self-joined FOUR ways. Spark-first: ONE orders
    // scan with four conditional sums per customer (pinned); the ratio
    // compare is integer cross-multiplication (w98*s97 > s98*w97 on
    // BIGINT cents — products < 2^63 by corpus bounds), so no float
    // ratios anywhere. The oracle keeps the four-way self-join
    // spelling as the equivalence proof.
    // Ref: /root/reference/benchmark/tpcds/query4.tpl, query74.tpl ---
    "ds54_growth_gate" -> ((s, dir) => {
      val oc = (col("o_totalprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val chanS = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      def arm(name: String, yr: Int, st: Boolean): Column =
        sum(when(year(col("o_orderdate")) === yr &&
          (if (st) chanS else !chanS), oc).otherwise(lit(0L)))
          .cast("bigint").as(name)
      Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(arm("s97", 1997, st = true), arm("s98", 1998, st = true),
          arm("w97", 1997, st = false), arm("w98", 1998, st = false))
        .filter(col("s97") > 0 && col("w97") > 0 &&
          col("s98") > 0 && col("w98") > 0)
        .filter(col("w98") * col("s97") > col("s98") * col("w97"))
        .orderBy(col("o_custkey"))
        .limit(100)
    }),

    // --- TPC-DS q54's cohort spend histogram: customers who bought a
    // PROMO-type part in March 1997 (the cohort semi-join), their
    // TOTAL order spend over the following quarter, counted into
    // $1000 revenue bands — the template's `segment = revenue/50`
    // banding. The band is integral `div` on BIGINT cents (the repo's
    // documented no-float-rounding convention); cohort membership is
    // a LeftSemi (pinned) so the m:n purchase history never
    // multiplies the spend scan.
    // Ref: /root/reference/benchmark/tpcds/query54.tpl ---
    "ds55_cohort_spend" -> ((s, dir) => {
      val oc = (col("o_totalprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val cohort = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part")
          .filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck")).distinct()
      Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-04-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
        .join(cohort, col("o_custkey") === col("ck"), "left_semi")
        .groupBy(col("o_custkey"))
        .agg(sum(oc).cast("bigint").as("spend_cents"))
        .select(expr("spend_cents div 100000").as("band"))
        .groupBy(col("band"))
        .agg(count(lit(1)).cast("bigint").as("n_cust"))
        .orderBy(col("band"))
    }),

    // --- TPC-DS q84's lookup-chain projection: a pure dimension chain
    // (customer -> nation -> region) with a concatenated display name
    // and a COALESCE'd fallback — the template's customer_id ||
    // coalesce(c_last_name,'') shape. No fact table at all: the whole
    // query is broadcast-sized dim navigation with a band predicate
    // and a paged ORDER BY. Ref:
    // /root/reference/benchmark/tpcds/query84.tpl ---
    "ds56_lookup_concat" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .filter(col("c_acctbal").between(1000, 3000))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.load(s, dir, "region")
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"),
          concat(col("c_name"), lit(", "),
            coalesce(nullif(col("c_mktsegment"), lit("")), lit("NONE")),
            lit(" ("), col("n_name"), lit(")")).as("customername"))
        .orderBy(col("c_custkey"))
        .limit(100)
    }),

    // --- TPC-DS q5/q77/q80's channel profit-and-loss: per channel,
    // gross sales MINUS return losses, rolled up to a grand total —
    // the templates UNION ALL a positive sales stream and a negated
    // returns stream per channel, then ROLLUP(channel). Spark-first:
    // ONE lineitem scan (pinned) computes sales cents and return-loss
    // cents as conditional sums per channel; the rollup grid is
    // 2-channel bounded. Channels are the ds22 priority convention;
    // profit stays BIGINT cents end to end.
    // Ref: /root/reference/benchmark/tpcds/query5.tpl, query77.tpl,
    // query80.tpl ---
    "ds57_channel_pnl" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "store")
            .otherwise("web").as("channel"),
          cents.as("cents"), col("l_returnflag"))
        .rollup(col("channel"))
        .agg(
          sum(when(col("l_returnflag") =!= "R", col("cents"))
            .otherwise(lit(0L))).cast("bigint").as("sales_cents"),
          sum(when(col("l_returnflag") === "R", col("cents"))
            .otherwise(lit(0L))).cast("bigint").as("returns_cents"),
          sum(when(col("l_returnflag") =!= "R", col("cents"))
            .otherwise(-col("cents"))).cast("bigint").as("profit_cents"))
        .select(coalesce(col("channel"), lit("TOTAL")).as("channel"),
          col("sales_cents"), col("returns_cents"), col("profit_cents"))
        .orderBy(col("channel"))
    }),

    // --- TPC-DS q28's six band-gated distinct-stats: per quantity
    // band, the count AND the count of DISTINCT prices — the template
    // cross-joins six single-band subqueries; Spark fuses them into
    // ONE scan (pinned) whose multiple COUNT(DISTINCT CASE...) aggs
    // plan through a single Expand (the engine's multi-distinct
    // machinery, exercised nowhere else in the corpus).
    // Ref: /root/reference/benchmark/tpcds/query28.tpl ---
    "ds58_band_distinct" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val bands = Seq((0, 10), (10, 20), (20, 30), (30, 40), (40, 50))
      val aggs = bands.zipWithIndex.flatMap { case ((lo, hi), i) =>
        val in = col("l_quantity") > lo && col("l_quantity") <= hi
        Seq(
          sum(when(in, 1L).otherwise(0L)).cast("bigint").as(s"cnt${i + 1}"),
          countDistinct(when(in, cents)).cast("bigint")
            .as(s"ndist${i + 1}"))
      }
      Tables.load(s, dir, "lineitem")
        .agg(aggs.head, aggs.tail: _*)
    }),

    // --- TPC-DS q33/q56/q60's union-of-channel-aggregates: three
    // windowed "channel" aggregates over a gated item list, UNION
    // ALL'd and re-aggregated to a per-brand total. The template scans
    // three channels separately; Spark-first fuses all three windows
    // into ONE scan (pinned) — the union-then-reaggregate is
    // algebraically a single conditional sum. The oracle keeps the
    // literal UNION ALL spelling as the equivalence proof.
    // Ref: /root/reference/benchmark/tpcds/query33.tpl, query56.tpl,
    // query60.tpl ---
    "ds59_union_reagg" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      def win(lo: String, hi: String): Column =
        col("l_shipdate") >= lit(lo).cast("timestamp") &&
          col("l_shipdate") < lit(hi).cast("timestamp")
      val anyWin = win("1997-02-01", "1997-03-01") ||
        win("1997-06-01", "1997-07-01") || win("1997-10-01", "1997-11-01")
      Tables.load(s, dir, "lineitem")
        .filter(anyWin)
        .join(Tables.load(s, dir, "part")
          .filter(col("p_type") === "SMALL"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(cents).cast("bigint").as("total_cents"))
        .orderBy(col("total_cents").desc, col("p_brand"))
    }),

    // --- TPC-DS q46/q68/q79's city-change gate: orders where SOME
    // line's supplier sits in a DIFFERENT nation than the customer —
    // the templates' `current_addr.ca_city <> bought_city` inequality
    // between two dimension arms of the same row. The inequality can
    // only evaluate post-join (pinned: equi-joins with a residual
    // filter); output is per-order amounts for the top mismatched
    // orders (query19.tpl's substr(ca_zip,1,5) <> s_zip is the same
    // gate at brand grain).
    // Ref: /root/reference/benchmark/tpcds/query19.tpl, query46.tpl,
    // query68.tpl, query79.tpl ---
    "ds60_city_change" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val cn = Tables.load(s, dir, "customer")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("cnk"),
            col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
        .select(col("c_custkey"), col("c_name"), col("cust_nation"))
      val sn = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
          .select(col("n_nationkey").as("snk"),
            col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select(col("s_suppkey"), col("supp_nation"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-05-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-06-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cn, col("o_custkey") === col("c_custkey"))
        .join(sn, col("l_suppkey") === col("s_suppkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("o_orderkey"), col("c_name"), col("cust_nation"))
        .agg(count(lit(1)).cast("bigint").as("n_foreign_lines"),
          sum(cents).cast("bigint").as("foreign_cents"))
        .orderBy(col("foreign_cents").desc, col("o_orderkey"))
        .limit(100)
    }),

    // --- TPC-DS q3/q42/q52/q55's brand-month report (the family's
    // shared shape: one month gate, brand rollout, revenue order):
    // December-1997 revenue per brand, top-10. One pushed-range scan,
    // one grid shuffle, TakeOrderedAndProject presentation.
    // Ref: /root/reference/benchmark/tpcds/query3.tpl, query42.tpl,
    // query52.tpl, query55.tpl ---
    "ds61_brand_month" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-12-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(cents).cast("bigint").as("rev_cents"))
        .orderBy(col("rev_cents").desc, col("p_brand"))
        .limit(10)
    }),

    // --- TPC-DS q53/q63's quarterly-deviation profile: per brand, how
    // many 1997 months deviate more than ±10% from that brand's OWN
    // quarterly mean (the templates' avg-over-quarter compare). The
    // deviation gate is pure integer cross-multiplication
    // (|3·m − q|·10 > q) over exact cents; output is the always-25-row
    // per-brand profile, so result cardinality is scale-stable while
    // the deviant-month count varies with sample noise as the
    // templates intend. ONE scan; the window runs over the ≤300-row
    // aggregated (brand, month) grid.
    // Ref: /root/reference/benchmark/tpcds/query53.tpl, query63.tpl ---
    "ds62_quarter_deviation" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val m = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          month(col("l_shipdate")).as("mo"),
          quarter(col("l_shipdate")).as("qt"))
        .agg(sum(cents).cast("bigint").as("mc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_brand"), col("qt"))
      m.withColumn("qc", sum(col("mc")).over(w).cast("bigint"))
        .withColumn("dev",
          when(abs(col("mc") * 3 - col("qc")) * 10 > col("qc"), 1L)
            .otherwise(0L))
        .groupBy(col("p_brand"))
        .agg(sum(col("dev")).cast("bigint").as("n_deviant_months"),
          sum(col("mc")).cast("bigint").as("total_cents"))
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q7/q26's demographic averages: four avg measures per
    // customer segment under a dim gate — exact integer sums divided
    // as DOUBLE at the end (the ds51 discipline at a single grouping
    // level). Ref: /root/reference/benchmark/tpcds/query7.tpl,
    // query26.tpl ---
    "ds63_segment_avgs" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val bps = (col("l_discount").cast(DecimalType(28, 4)) *
        lit(10000)).cast("bigint")
      val qcents = (col("l_quantity").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).cast("bigint").as("n"),
          (sum(qcents).cast("double") / count(lit(1)).cast("double"))
            .as("avg_qty_cents"),
          (sum(cents).cast("double") / count(lit(1)).cast("double"))
            .as("avg_price_cents"),
          (sum(bps).cast("double") / count(lit(1)).cast("double"))
            .as("avg_disc_bps"))
        .orderBy(col("c_mktsegment"))
    }),

    // --- TPC-DS q96's time-band count: one scalar count under an
    // hour-band + type + measure gate — on the events stream (the
    // corpus's clock-bearing table). Single pushed-predicate scan,
    // one row out. Ref: /root/reference/benchmark/tpcds/query96.tpl ---
    "ds64_time_band_count" -> ((s, dir) => {
      Tables.events(s, dir)
        .filter(hour(col("t")).between(9, 11))
        .filter(col("event_type") === "view")
        .filter(col("value") > 50)
        .agg(count(lit(1)).cast("bigint").as("n"))
    }),

    // --- TPC-DS q61's promotional-share ratio: promotional revenue
    // over total revenue for one month as the templates' TWO scalar
    // aggregates cross-joined; Spark fuses both into ONE conditional-
    // aggregation scan (pinned), the oracle keeps the two-subquery
    // spelling. Share = exact cents divided once in DOUBLE, ×100.
    // Ref: /root/reference/benchmark/tpcds/query61.tpl ---
    "ds65_promo_share" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-08-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-09-01").cast("timestamp"))
        .join(Tables.load(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        // The oracle COALESCEs only the promo arm (its subquery can be
        // empty under the p_type gate while the month has rows); mirror
        // that exactly so an empty month yields (0, NULL, NULL) on both
        // engines (ADVICE r15).
        .agg(
          coalesce(sum(when(col("p_type") === "PROMO", cents)
            .otherwise(lit(0L))), lit(0L))
            .cast("bigint").as("promo_cents"),
          sum(cents).cast("bigint").as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          (col("promo_cents").cast("double") * 100.0 /
            col("total_cents").cast("double")).as("promo_pct"))
    }),

    // --- TPC-DS q8's zip-prefix ∩ preferred-customers gate: a nation
    // qualifies through a computed name-prefix IN-list AND by having
    // >= 2 preferred (high-balance) customers — the template's
    // substr(zip,1,2) IN (...) INTERSECT preferred-customer zips, both
    // conditions on the SAME grouping dim, then fact revenue per
    // qualifying nation. The preferred-count is a dim-side aggregate
    // joined back (never a correlated probe).
    // Ref: /root/reference/benchmark/tpcds/query8.tpl ---
    "ds66_zip_prefix_gate" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val pref = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 5000)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).cast("bigint").as("n_pref"))
        .filter(col("n_pref") >= 2)
      val nat = Tables.load(s, dir, "nation")
        .filter(substring(col("n_name"), 8, 1).isin("1", "2"))
        .join(pref, col("n_nationkey") === col("nk"))
        .select(col("n_nationkey"), col("n_name"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-04-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        // no broadcast hint: the qualifying-nation subtree aggregates
        // the scale-proportional customer dim, so the ≤25-row build
        // side is AQE's runtime call, not a plan-time promise
        .join(nat, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents).cast("bigint").as("rev_cents"),
          count(lit(1)).cast("bigint").as("n"))
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q64's cross-year self-join of an aggregated multi-join
    // CTE: the template builds cross_sales (a ~10-dim join aggregated
    // per item+year) and joins it to ITSELF on item with
    // `cs2.cnt <= cs1.cnt` between the instances. Here the CTE is
    // lineitem⋈orders⋈customer aggregated per (part, year); the
    // cross-year join runs on the aggregated grain (item-bounded, not
    // data-bounded) and the count gate is the template's inequality
    // verbatim. Per-brand rollout, exact cents.
    // Ref: /root/reference/benchmark/tpcds/query64.tpl ---
    "ds67_cross_year_pairs" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val base = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_partkey").as("pk"),
          year(col("l_shipdate")).as("yr"))
        .agg(count(lit(1)).cast("bigint").as("cnt"),
          sum(cents).cast("bigint").as("rev"))
      val y1 = base.filter(col("yr") === 1997)
        .select(col("pk").as("pk1"), col("cnt").as("cnt1"),
          col("rev").as("rev1"))
      val y2 = base.filter(col("yr") === 1998)
        .select(col("pk").as("pk2"), col("cnt").as("cnt2"),
          col("rev").as("rev2"))
      y1.join(y2, col("pk1") === col("pk2") && col("cnt2") <= col("cnt1"))
        .join(Tables.load(s, dir, "part"),
          col("pk1") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).cast("bigint").as("n_items"),
          sum(col("rev1")).cast("bigint").as("rev97_cents"),
          sum(col("rev2")).cast("bigint").as("rev98_cents"))
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q40's netted before/after report: per warehouse (here
    // supplier), sales value before vs after a pivot date, each NETTED
    // of returns via the template's `COALESCE(cr_refunded_cash, 0)` on
    // an OUTER join — returns aggregated at the (supplier, side) grain
    // LEFT JOINed onto sales so suppliers with no returns in a window
    // net against zero, not NULL.
    // Ref: /root/reference/benchmark/tpcds/query40.tpl ---
    "ds68_netted_pivot" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val win = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-05-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-07-01").cast("timestamp"))
        .select(col("l_suppkey"), col("l_returnflag"), cents.as("cents"),
          (col("l_shipdate") < lit("1997-06-01").cast("timestamp"))
            .as("before"))
      val sales = win.groupBy(col("l_suppkey").as("sk"), col("before"))
        .agg(sum(col("cents")).cast("bigint").as("gross"))
      val rets = win.filter(col("l_returnflag") === "R")
        .groupBy(col("l_suppkey").as("rk"), col("before").as("rb"))
        .agg(sum(col("cents")).cast("bigint").as("ret"))
      sales.join(rets,
          col("sk") === col("rk") && col("before") === col("rb"), "left")
        .select(col("sk"), col("before"),
          (col("gross") - coalesce(col("ret"), lit(0L))).as("net"))
        .groupBy(col("sk"))
        .agg(sum(when(col("before"), col("net")).otherwise(lit(0L)))
          .cast("bigint").as("before_net"),
          sum(when(!col("before"), col("net")).otherwise(lit(0L)))
            .cast("bigint").as("after_net"))
        .join(Tables.load(s, dir, "supplier"),
          col("sk") === col("s_suppkey"))
        .select(col("s_name"), col("before_net"), col("after_net"))
        .orderBy(col("s_name"))
    }),

    // --- TPC-DS q24's above-global-average pair gate: revenue per
    // (customer, part) pair kept where it exceeds 5% of the average
    // pair revenue over ALL pairs — a two-level aggregate compared
    // against a global scalar of the first level. The 5% gate is pure
    // integer cross-multiplication (rev·n·20 > total); the scalar
    // (one row) cross-joins back. Output: qualifying-pair profile per
    // nation. Ref: /root/reference/benchmark/tpcds/query24.tpl ---
    "ds69_pair_gate" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val pairs = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("ck"), col("l_partkey").as("pk"))
        .agg(sum(cents).cast("bigint").as("rev"))
      val tot = pairs.agg(sum(col("rev")).cast("decimal(38,0)").as("t"),
        count(lit(1)).cast("bigint").as("np"))
      pairs.join(tot)
        .filter(col("rev").cast("decimal(38,0)") * col("np") * 20 >
          col("t"))
        .join(Tables.load(s, dir, "customer"),
          col("ck") === col("c_custkey"))
        .join(broadcast(Tables.load(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).cast("bigint").as("n_pairs"),
          sum(col("rev")).cast("bigint").as("qual_cents"))
        .orderBy(col("n_name"))
    }),

    // --- TPC-DS q91's call-center loss report: returned value grouped
    // by (center ≈ priority, month) under a customer-segment gate —
    // the template's returns-loss management report. One pushed-flag
    // scan, bounded grid out.
    // Ref: /root/reference/benchmark/tpcds/query91.tpl ---
    "ds70_return_loss" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .join(Tables.load(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderpriority"),
          month(col("o_orderdate")).as("mo"))
        .agg(sum(cents).cast("bigint").as("loss_cents"),
          count(lit(1)).cast("bigint").as("n_returns"))
        .orderBy(col("o_orderpriority"), col("mo"))
    }),

    // --- TPC-DS q78's returns-excluded year-over-year compare: sales
    // lines whose (order, part) was EVER returned are dropped via the
    // template's `LEFT JOIN returns ... WHERE wr_order_number IS NULL`
    // — planned as a LeftAnti against the distinct returned keys
    // (pinned; the job18/job27 discipline) — then per-part year totals
    // joined across 1997/1998 with both-present semantics and a brand
    // rollout with the yoy ratio as one DOUBLE division.
    // Ref: /root/reference/benchmark/tpcds/query78.tpl ---
    "ds71_anti_return_yoy" -> ((s, dir) => {
      val qcents = (col("l_quantity").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val retKeys = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rok"), col("l_partkey").as("rpk"))
        .distinct()
      val clean = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(retKeys, col("l_orderkey") === col("rok") &&
          col("l_partkey") === col("rpk"), "left_anti")
        .groupBy(col("l_partkey").as("pk"),
          year(col("l_shipdate")).as("yr"))
        .agg(sum(qcents).cast("bigint").as("qty"))
      val y1 = clean.filter(col("yr") === 1997)
        .select(col("pk").as("pk1"), col("qty").as("q1"))
      val y2 = clean.filter(col("yr") === 1998)
        .select(col("pk").as("pk2"), col("qty").as("q2"))
      y1.join(y2, col("pk1") === col("pk2"))
        .join(Tables.load(s, dir, "part"),
          col("pk1") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("q1")).cast("bigint").as("qty97_cents"),
          sum(col("q2")).cast("bigint").as("qty98_cents"))
        .select(col("p_brand"), col("qty97_cents"), col("qty98_cents"),
          (col("qty98_cents").cast("double") /
            col("qty97_cents").cast("double")).as("yoy_ratio"))
        .orderBy(col("p_brand"))
    }),

    // --- TPC-DS q76's missing-dimension counts: lines whose part is
    // NOT in the catalogued dimension subset (the template's
    // "ws_ship_customer_sk IS NULL" class), counted per (channel,
    // year). The miss probe is a LeftAnti by construction (the
    // job18/job27 discipline — Catalyst has no left-join-IS-NULL →
    // anti rewrite, so the plan states the anti directly and the
    // ORACLE keeps the NOT-IN spelling); Spark fuses both channels
    // into ONE scan with the channel as a group key.
    // Ref: /root/reference/benchmark/tpcds/query76.tpl ---
    "ds72_missing_dim" -> ((s, dir) => {
      val cents = (col("l_extendedprice").cast(DecimalType(28, 2)) *
        lit(100)).cast("bigint")
      val cat = Tables.load(s, dir, "part")
        .filter(col("p_size") <= 45)
        .select(col("p_partkey").as("cpk"))
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cat, col("l_partkey") === col("cpk"), "left_anti")
        .groupBy(
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "store")
            .otherwise("web").as("channel"),
          year(col("l_shipdate")).as("yr"))
        .agg(count(lit(1)).cast("bigint").as("n_missing"),
          sum(cents).cast("bigint").as("cents"))
        .orderBy(col("channel"), col("yr"))
    }),

    // --- TPC-DS q72's inventory-shortfall signature — the last
    // uncited template: FACT (sale) x FACT-AT-MATCHING-WEEK (inventory
    // position) x dims, with a cross-fact quantity inequality
    // (on-hand < ordered), a late-shipment date gate (+5 days), two
    // demographic gates, a LEFT-JOINed promotion arm split via CASE ON
    // NULL, and a LEFT-JOINed returns probe. Corpus mapping: sale =
    // lineitem+orders, inventory = events as daily warehouse positions
    // (item = event_id mod 200 — the sf0.001 part domain, a fixed
    // tracked-item subset valid at every scale; warehouse = user
    // bucket, on-hand = value); the events clock (2024-01, ISO weeks
    // 1..5) doesn't overlap the orders clock (1995-2001), so q72's
    // d1.d_week_seq = d2.d_week_seq becomes WEEK-OF-YEAR SLOT equality
    // — the same fact-to-fact week equi-join, on the alignment the
    // synthetic clocks allow. Scale shape: both facts shuffle ONCE on
    // the (item, week) join key with the quantity inequality as a
    // residual filter (never a cross join); the year gate is a pushed
    // timestamp range (the sb1 lesson — no year() in the scan); promo/
    // returns are key-grain LEFT probes; output is a grouped
    // TakeOrderedAndProject.
    // Ref: /root/reference/benchmark/tpcds/query72.tpl ---
    "ds73_inventory_shortfall" -> ((s, dir) => {
      val inv = graft.Tables.events(s, dir)
        .select(((col("event_id") % 200) + 1).as("ipk"),
          weekofyear(col("t")).as("iwk"),
          concat(lit("WH_"), (col("user_id") % 10).cast("string"))
            .as("warehouse"),
          col("value").as("on_hand"))
      val building = Tables.load(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"))
      val sales = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 5 DAYS"))
        .filter(col("o_orderpriority")
          .isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .join(building, col("o_custkey") === col("c_custkey"),
          "left_semi")
        .select(col("l_partkey"), col("l_orderkey"), col("l_quantity"),
          weekofyear(col("o_orderdate")).as("wk"))
      val promo = Tables.load(s, dir, "part")
        .filter(col("p_type") === "PROMO")
        .select(col("p_partkey").as("prk"))
      val rets = Tables.load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("rok"), col("l_partkey").as("rpk"))
        .distinct()
      sales
        .join(inv, col("l_partkey") === col("ipk") &&
          col("wk") === col("iwk") &&
          col("on_hand") < col("l_quantity").cast("double") * 10)
        .join(Tables.load(s, dir, "part")
            .select(col("p_partkey"), col("p_name")),
          col("l_partkey") === col("p_partkey"))
        .join(promo, col("l_partkey") === col("prk"), "left")
        .join(rets, col("l_orderkey") === col("rok") &&
          col("l_partkey") === col("rpk"), "left")
        .groupBy(col("p_name").as("item_desc"), col("warehouse"),
          col("wk"))
        .agg(
          sum(when(col("prk").isNull, 1L).otherwise(0L))
            .cast("bigint").as("no_promo"),
          sum(when(col("prk").isNotNull, 1L).otherwise(0L))
            .cast("bigint").as("promo"),
          sum(when(col("rok").isNotNull, 1L).otherwise(0L))
            .cast("bigint").as("returned"),
          count(lit(1)).cast("bigint").as("total_cnt"))
        .orderBy(col("total_cnt").desc, col("item_desc"),
          col("warehouse"), col("wk"))
        .limit(100)
    }))

  val oracles: Map[String, String] = Map(
    "ds22_growth_compare" -> """
      WITH base AS (
        SELECT c_nationkey AS nat,
          CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 's' ELSE 'w' END AS chan,
          CAST(quarter(o_orderdate) AS INT) AS q,
          CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100 AS BIGINT)
            AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-04-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'),
      piv AS (
        SELECT nat,
          CAST(SUM(CASE WHEN chan='s' AND q=2 THEN cents ELSE 0 END)
               AS BIGINT) AS s2,
          CAST(SUM(CASE WHEN chan='s' AND q=3 THEN cents ELSE 0 END)
               AS BIGINT) AS s3,
          CAST(SUM(CASE WHEN chan='w' AND q=2 THEN cents ELSE 0 END)
               AS BIGINT) AS w2,
          CAST(SUM(CASE WHEN chan='w' AND q=3 THEN cents ELSE 0 END)
               AS BIGINT) AS w3
        FROM base GROUP BY 1)
      SELECT nat, s2, s3, w2, w3
      FROM piv
      WHERE s2 > 0 AND w2 > 0 AND s3 > 0 AND w3 > 0
        AND CAST(w3 AS HUGEINT) * s2 > CAST(s3 AS HUGEINT) * w2
      ORDER BY nat""",
    "ds23_attribute_fan" -> """
      SELECT DISTINCT p_name, p_brand, p_size
      FROM part p
      WHERE ( (p_type = 'PROMO'    AND p_size BETWEEN 1 AND 15)
           OR (p_type = 'ECONOMY'  AND p_size BETWEEN 16 AND 30)
           OR (p_type = 'STANDARD' AND p_size BETWEEN 31 AND 50) )
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_partkey = p.p_partkey
                      AND l.l_quantity >= 40)
      ORDER BY p_name, p_brand, p_size""",
    "ds19_wow_dow_pivot" -> """
      WITH base AS (
        SELECT c_nationkey AS nat,
          CAST(datediff('day', DATE '1970-01-01', o_orderdate)
               AS BIGINT) AS ud,
          year(o_orderdate) AS yr,
          CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100 AS BIGINT)
            AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'),
      piv AS (
        SELECT nat, ud // 7 - 52 * (yr - 1997) AS wk,
          CAST(SUM(CASE WHEN yr=1997 AND (ud+4)%7=0 THEN cents ELSE 0 END)
               AS BIGINT) AS sun1,
          CAST(SUM(CASE WHEN yr=1998 AND (ud+4)%7=0 THEN cents ELSE 0 END)
               AS BIGINT) AS sun2,
          CAST(SUM(CASE WHEN yr=1997 AND (ud+4)%7=3 THEN cents ELSE 0 END)
               AS BIGINT) AS wed1,
          CAST(SUM(CASE WHEN yr=1998 AND (ud+4)%7=3 THEN cents ELSE 0 END)
               AS BIGINT) AS wed2,
          CAST(SUM(CASE WHEN yr=1997 AND (ud+4)%7=6 THEN cents ELSE 0 END)
               AS BIGINT) AS sat1,
          CAST(SUM(CASE WHEN yr=1998 AND (ud+4)%7=6 THEN cents ELSE 0 END)
               AS BIGINT) AS sat2,
          CAST(SUM(CASE WHEN yr=1997 THEN cents ELSE 0 END) AS BIGINT)
            AS tot1,
          CAST(SUM(CASE WHEN yr=1998 THEN cents ELSE 0 END) AS BIGINT)
            AS tot2
        FROM base GROUP BY 1, 2)
      SELECT nat, wk,
        CASE WHEN sun1 > 0 THEN sun2 * 1000000 // sun1 END AS sun_ppm,
        CASE WHEN wed1 > 0 THEN wed2 * 1000000 // wed1 END AS wed_ppm,
        CASE WHEN sat1 > 0 THEN sat2 * 1000000 // sat1 END AS sat_ppm,
        tot2 * 1000000 // tot1 AS tot_ppm
      FROM piv WHERE tot1 > 0 AND tot2 > 0
      ORDER BY nat, wk""",
    "ds20_declining_brands" -> """
      WITH chan AS (
        SELECT l_partkey, year(o_orderdate) AS yr,
          CAST(l_quantity AS BIGINT) AS qty,
          CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT)
            AS cents,
          CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END AS sgn
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'),
      agg AS (
        SELECT p_brand,
          CAST(SUM(CASE WHEN yr=1997 THEN sgn*qty ELSE 0 END) AS BIGINT)
            AS q1,
          CAST(SUM(CASE WHEN yr=1998 THEN sgn*qty ELSE 0 END) AS BIGINT)
            AS q2,
          CAST(SUM(CASE WHEN yr=1997 THEN sgn*cents ELSE 0 END) AS BIGINT)
            AS r1,
          CAST(SUM(CASE WHEN yr=1998 THEN sgn*cents ELSE 0 END) AS BIGINT)
            AS r2
        FROM chan JOIN part ON l_partkey = p_partkey GROUP BY 1)
      SELECT p_brand, q1, q2, q1 - q2 AS qty_drop,
        r1 - r2 AS rev_drop_cents
      FROM agg WHERE q2 < q1
      ORDER BY qty_drop DESC, p_brand""",
    "ds21_frequent_buyers" -> """
      WITH cnt AS (
        SELECT l_orderkey, COUNT(*) AS n_items
        FROM lineitem GROUP BY 1
        HAVING COUNT(*) BETWEEN 8 AND 12)
      SELECT c_custkey, c_name, o_orderkey, n_items
      FROM cnt JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
      ORDER BY n_items DESC, c_custkey, o_orderkey""",
    "ds16_yoy_channel_ratio" -> """
      WITH piv AS (
        SELECT o_custkey AS c_custkey,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         AND year(o_orderdate) = 1997
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         AND year(o_orderdate) = 1998
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS s2,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         AND year(o_orderdate) = 1997
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS w1,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         AND year(o_orderdate) = 1998
                    THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                              AS BIGINT) ELSE 0 END) AS BIGINT) AS w2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY o_custkey)
      SELECT c_custkey, s1, s2, w1, w2
      FROM piv
      WHERE s1 > 0 AND w1 > 0 AND s2 > 0 AND w2 > 0
        AND w2 * s1 > s2 * w1
      ORDER BY c_custkey""",
    "ds17_volatility_band" -> """
      WITH g AS (
        SELECT l_suppkey, month(l_shipdate) AS m,
          COUNT(*) AS n,
          SUM(CAST(l_quantity AS BIGINT)) AS sx,
          SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS sx2
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
        HAVING COUNT(*) >= 2),
      band AS (
        SELECT * FROM g
        WHERE 4 * CAST(n AS HUGEINT) * (n * sx2 - sx * sx)
              > CAST(n - 1 AS HUGEINT) * sx * sx)
      SELECT b1.l_suppkey, CAST(b1.m AS INT) AS m,
        b1.n AS n1, CAST(b1.sx AS DOUBLE) / CAST(b1.n AS DOUBLE) AS mean1,
        b2.n AS n2, CAST(b2.sx AS DOUBLE) / CAST(b2.n AS DOUBLE) AS mean2
      FROM band b1 JOIN band b2
        ON b1.l_suppkey = b2.l_suppkey AND b2.m = b1.m + 1
      ORDER BY b1.l_suppkey, m""",
    "ds18_revenue_bands" -> """
      WITH my_customers AS (
        SELECT DISTINCT o_custkey
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
        WHERE p_type IN ('PROMO', 'ECONOMY')
          AND o_orderdate >= TIMESTAMP '1997-03-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'),
      my_revenue AS (
        SELECT o_custkey,
          SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                   AS BIGINT)) AS rev_c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey IN (SELECT o_custkey FROM my_customers)
          AND o_orderdate >= TIMESTAMP '1997-04-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        GROUP BY o_custkey)
      SELECT CAST(rev_c // 5000000 AS INT) AS segment,
        COUNT(*) AS num_customers,
        CAST(CAST(rev_c // 5000000 AS INT) * 50000 AS INT)
          AS segment_base_usd
      FROM my_revenue
      GROUP BY 1
      ORDER BY segment""",
    "ds15_cross_channel_items" -> """
      WITH ret AS (SELECT DISTINCT l_partkey FROM lineitem
                   WHERE l_returnflag = 'R'),
      acc AS (SELECT DISTINCT l_partkey FROM lineitem
              WHERE l_returnflag = 'A'),
      non AS (SELECT DISTINCT l_partkey FROM lineitem
              WHERE l_returnflag = 'N'),
      cross_items AS (
        SELECT l_partkey FROM ret
        INTERSECT SELECT l_partkey FROM acc
        INTERSECT SELECT l_partkey FROM non)
      SELECT p_brand,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(28,6))) AS DOUBLE) AS rev,
        COUNT(*) AS n
      FROM lineitem
        JOIN part ON l_partkey = p_partkey
      WHERE l_partkey IN (SELECT l_partkey FROM cross_items)
      GROUP BY p_brand
      ORDER BY p_brand""",
    "ds13_multi_exists" -> """
      SELECT c_mktsegment, COUNT(*) AS n_cust,
        MIN(c_name) AS first_cust,
        CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
          AS acctbal_cents
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c.c_custkey
                      AND o_orderpriority = '1-URGENT')
        AND (EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c.c_custkey
                       AND o_totalprice > 150000.0)
          OR EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c.c_custkey
                       AND o_orderpriority = '5-LOW'))
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""",
    "ds14_before_after" -> """
      WITH g AS (
        SELECT l_suppkey, l_partkey,
          CAST(SUM(CASE WHEN CAST(l_shipdate AS TIMESTAMP)
                             < TIMESTAMP '1998-07-01'
                        THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
               AS BIGINT) AS qty_before,
          CAST(SUM(CASE WHEN CAST(l_shipdate AS TIMESTAMP)
                             >= TIMESTAMP '1998-07-01'
                        THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
               AS BIGINT) AS qty_after
        FROM lineitem GROUP BY l_suppkey, l_partkey)
      SELECT s_name, l_partkey AS p_partkey, qty_before, qty_after
      FROM g JOIN supplier ON l_suppkey = s_suppkey
      WHERE qty_before > 0 AND qty_after > 0
        AND qty_before * 2 <= qty_after * 3
        AND qty_after * 2 <= qty_before * 3
      ORDER BY s_name, p_partkey""",
    "ds12_channel_overlap" -> """
      WITH cs AS (
        SELECT DISTINCT user_id AS u,
          CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
        FROM events
        WHERE event_type = 'click'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16'),
      ps AS (
        SELECT DISTINCT user_id AS u,
          CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d
        FROM events
        WHERE event_type = 'purchase'
          AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16')
      SELECT
        CAST(SUM(CASE WHEN cs.u IS NOT NULL AND ps.u IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS click_only,
        CAST(SUM(CASE WHEN cs.u IS NULL AND ps.u IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS purchase_only,
        CAST(SUM(CASE WHEN cs.u IS NOT NULL AND ps.u IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS click_and_purchase
      FROM cs FULL OUTER JOIN ps ON cs.u = ps.u AND cs.d = ps.d""",
    "ds11_rollup_topk" -> """
      WITH base AS (
        SELECT o_orderpriority AS prio,
          CAST(year(o_orderdate) AS INT) AS yr,
          CAST(month(o_orderdate) AS INT) AS mo,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      agg AS (
        SELECT prio, yr, mo, CAST(SUM(cents) AS BIGINT) AS sales_cents,
          CAST(GROUPING(prio) * 4 + GROUPING(yr) * 2 + GROUPING(mo)
            AS INT) AS gid
        FROM base GROUP BY ROLLUP (prio, yr, mo)),
      rk AS (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY prio
          ORDER BY sales_cents DESC, gid ASC,
                   yr ASC NULLS FIRST, mo ASC NULLS FIRST) AS INT) AS rk
        FROM agg)
      SELECT prio, yr, mo, sales_cents, gid, rk
      FROM rk WHERE rk <= 5 ORDER BY prio NULLS FIRST, rk""",
    "ds9_count_band" -> """
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS spend_cents
      FROM orders GROUP BY o_custkey
      HAVING COUNT(*) BETWEEN 8 AND 12
      ORDER BY o_custkey""",
    "ds10_net_returns" -> """
      WITH per AS (
        SELECT l_orderkey,
          SUM(CAST(l_quantity AS DECIMAL(28,6))) AS q_all,
          SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
            ELSE 0.0 END AS DECIMAL(28,6))) AS q_ret,
          COUNT(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey)
      SELECT l_orderkey, CAST(q_all - q_ret AS DOUBLE) AS net_qty,
        CAST(q_ret AS DOUBLE) AS ret_qty, n_lines
      FROM per ORDER BY net_qty DESC, l_orderkey LIMIT 15""",
    "ds8_multichannel" -> """
      WITH o AS (
        SELECT o_custkey AS ck,
          CAST(year(o_orderdate) AS INT) AS y,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'urgent' ELSE 'routine' END AS chan,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      agg AS (
        SELECT ck, y, chan, CAST(SUM(cents) AS BIGINT) AS spend
        FROM o GROUP BY ck, y, chan),
      u AS (SELECT ck, y AS y1, spend AS u_cents
            FROM agg WHERE chan = 'urgent'),
      r AS (SELECT ck AS ck2, y AS y2, spend AS r_cents
            FROM agg WHERE chan = 'routine')
      SELECT y1, COUNT(*) AS n_grown,
        CAST(SUM(u_cents) AS BIGINT) AS tot_u_cents,
        CAST(SUM(r_cents) AS BIGINT) AS tot_r_cents
      FROM u JOIN r ON ck = ck2 AND y2 = y1 + 1
      WHERE r_cents > u_cents
      GROUP BY y1 ORDER BY y1""",
    "ds7_cumulative_crossover" -> """
      WITH o AS (
        SELECT o_custkey % 50 AS bucket,
          CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
            AS TIMESTAMP) AS m,
          o_orderpriority AS pri,
          CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders),
      a AS (
        SELECT bucket, m, CAST(SUM(cents) AS BIGINT) AS rev
        FROM o WHERE pri IN ('1-URGENT', '2-HIGH') GROUP BY bucket, m),
      ac AS (
        SELECT bucket, m,
          CAST(SUM(rev) OVER (PARTITION BY bucket ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_hi
        FROM a),
      b AS (
        SELECT bucket, m, CAST(SUM(cents) AS BIGINT) AS rev
        FROM o WHERE pri NOT IN ('1-URGENT', '2-HIGH') GROUP BY bucket, m),
      bc AS (
        SELECT bucket, m,
          CAST(SUM(rev) OVER (PARTITION BY bucket ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_lo
        FROM b),
      j AS (
        SELECT COALESCE(ac.bucket, bc.bucket) AS bucket,
          COALESCE(ac.m, bc.m) AS m, cum_hi, cum_lo
        FROM ac FULL OUTER JOIN bc
          ON ac.bucket = bc.bucket AND ac.m = bc.m),
      f AS (
        SELECT bucket, m,
          MAX(cum_hi) OVER (PARTITION BY bucket ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS urgent_cum_cents,
          MAX(cum_lo) OVER (PARTITION BY bucket ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS routine_cum_cents
        FROM j)
      SELECT bucket, m, urgent_cum_cents, routine_cum_cents
      FROM f WHERE urgent_cum_cents > routine_cum_cents
      ORDER BY bucket, m""",
    "ds5_frequent_items" -> """
      WITH freq AS (
        SELECT l_partkey FROM lineitem
        GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 4)
      SELECT o_custkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(28,6))) AS DOUBLE) AS spend,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(*) AS n_lines
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
      WHERE l_partkey IN (SELECT l_partkey FROM freq)
      GROUP BY o_custkey
      ORDER BY spend DESC, o_custkey LIMIT 10""",
    "ds6_multi_band" -> """
      SELECT
        CAST(SUM(CASE WHEN l_quantity >= 0 AND l_quantity < 7 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
        CAST(SUM(CASE WHEN l_quantity >= 7 AND l_quantity < 14 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
        CAST(SUM(CASE WHEN l_quantity >= 14 AND l_quantity < 21 THEN 1 ELSE 0 END) AS BIGINT) AS b3,
        CAST(SUM(CASE WHEN l_quantity >= 21 AND l_quantity < 28 THEN 1 ELSE 0 END) AS BIGINT) AS b4,
        CAST(SUM(CASE WHEN l_quantity >= 28 AND l_quantity < 35 THEN 1 ELSE 0 END) AS BIGINT) AS b5,
        CAST(SUM(CASE WHEN l_quantity >= 35 AND l_quantity < 42 THEN 1 ELSE 0 END) AS BIGINT) AS b6,
        CAST(SUM(CASE WHEN l_quantity >= 42 AND l_quantity < 49 THEN 1 ELSE 0 END) AS BIGINT) AS b7,
        CAST(SUM(CASE WHEN l_quantity >= 49 AND l_quantity < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS b8
      FROM lineitem WHERE l_discount >= 0.02""",
    "ds1_margin_rollup" -> """
      WITH agg AS (
        SELECT o_orderpriority, l_returnflag,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(28,6))) AS DOUBLE) /
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
            AS margin,
          CAST(GROUPING(o_orderpriority) + GROUPING(l_returnflag) AS INT)
            AS lochierarchy
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY ROLLUP(o_orderpriority, l_returnflag))
      SELECT o_orderpriority, l_returnflag, ROUND(margin, 6) AS margin,
        lochierarchy,
        CAST(RANK() OVER (
          PARTITION BY lochierarchy,
            CASE WHEN lochierarchy = 0 THEN o_orderpriority END
          ORDER BY margin, o_orderpriority, l_returnflag) AS INT) AS rk
      FROM agg
      ORDER BY lochierarchy DESC, o_orderpriority, rk""",
    "ds2_category_topk" -> """
      WITH agg AS (
        SELECT p_brand, p_partkey,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(28,6))) AS DOUBLE) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey)
      SELECT p_brand, p_partkey, rev,
        CAST(rk AS INT) AS rk
      FROM (
        SELECT *, RANK() OVER (PARTITION BY p_brand
                               ORDER BY rev DESC, p_partkey) AS rk
        FROM agg) x
      WHERE rk <= 3 ORDER BY p_brand, rk""",
    "ds3_period_delta" -> """
      WITH m AS (
        SELECT o_orderpriority,
          CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
               AS TIMESTAMP) AS m,
          SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev_d
        FROM orders GROUP BY 1, 2)
      SELECT o_orderpriority, m,
        CAST(rev_d AS DOUBLE) AS rev,
        CAST(rev_d - lag(rev_d) OVER w AS DOUBLE) AS delta,
        ROUND(CAST(rev_d AS DOUBLE) /
              CAST(lag(rev_d) OVER w AS DOUBLE) - 1.0, 6) AS pct
      FROM m
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY m)
      ORDER BY o_orderpriority, m""",
    "ds4_avg_deviation" -> """
      WITH daily AS (
        SELECT event_type,
          CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS d,
          SUM(CAST(value AS DECIMAL(28,6))) AS tot_d
        FROM events GROUP BY 1, 2),
      ratioed AS (
        SELECT event_type, d, tot_d,
          CAST(SUM(tot_d) OVER w AS DOUBLE) / CAST(COUNT(*) OVER w AS DOUBLE)
            AS avg_tot
        FROM daily
        WINDOW w AS (PARTITION BY event_type))
      SELECT event_type, d, CAST(tot_d AS DOUBLE) AS tot,
        ROUND(avg_tot, 6) AS avg_tot,
        ROUND(CAST(tot_d AS DOUBLE) / avg_tot, 6) AS ratio
      FROM ratioed
      WHERE ABS(CAST(tot_d AS DOUBLE) / avg_tot - 1.0) > 0.05
      ORDER BY event_type, d""",
    "ds24_cyclic_deviation" -> """
      WITH g AS (
        SELECT p_brand, CAST(EXTRACT(month FROM l_shipdate) AS INT) AS m,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      w AS (
        SELECT p_brand, m, q,
          CAST(SUM(q) OVER (PARTITION BY p_brand) AS BIGINT) AS yr,
          COUNT(*) OVER (PARTITION BY p_brand) AS nm,
          LAG(q)  OVER (PARTITION BY p_brand ORDER BY m) AS prev_q,
          LEAD(q) OVER (PARTITION BY p_brand ORDER BY m) AS next_q
        FROM g)
      SELECT p_brand, m, q, prev_q, next_q,
        CAST(yr AS DOUBLE) / CAST(nm AS DOUBLE) AS avg_q
      FROM w
      WHERE nm = 12 AND ABS(12 * q - yr) * 10 > yr
      ORDER BY p_brand, m""",
    "ds25_return_ratios" -> """
      WITH agg AS (
        SELECT l_linestatus AS channel, p_brand,
          CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS ret_q,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sold_q,
          CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(28,6))
                                  * 1000000 AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS ret_amt,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
                        * 1000000 AS BIGINT)) AS BIGINT) AS sold_amt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      rk AS (
        SELECT channel, p_brand,
          CAST(ret_q AS DOUBLE) / CAST(sold_q AS DOUBLE) AS qty_ratio,
          CAST(ret_amt AS DOUBLE) / CAST(sold_amt AS DOUBLE) AS amt_ratio,
          CAST(RANK() OVER (PARTITION BY channel
            ORDER BY CAST(ret_q AS DOUBLE) / CAST(sold_q AS DOUBLE) DESC,
                     p_brand) AS INT) AS rnk_qty,
          CAST(RANK() OVER (PARTITION BY channel
            ORDER BY CAST(ret_amt AS DOUBLE) / CAST(sold_amt AS DOUBLE) DESC,
                     p_brand) AS INT) AS rnk_amt
        FROM agg)
      SELECT channel, p_brand, qty_ratio, amt_ratio, rnk_qty, rnk_amt
      FROM rk WHERE rnk_qty <= 10 OR rnk_amt <= 10
      ORDER BY channel, rnk_qty, rnk_amt, p_brand""",
    "ds26_channel_stats" -> """
      SELECT p_brand,
        CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_cnt,
        CAST(SUM(CASE WHEN l_returnflag = 'N'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             AS BIGINT) AS n_sum,
        CAST(SUM(CASE WHEN l_returnflag = 'N'
                      THEN CAST(l_quantity AS BIGINT)
                           * CAST(l_quantity AS BIGINT) ELSE 0 END)
             AS BIGINT) AS n_sum2,
        CAST(SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
             AS BIGINT) AS a_cnt,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             AS BIGINT) AS a_sum,
        CAST(SUM(CASE WHEN l_returnflag = 'A'
                      THEN CAST(l_quantity AS BIGINT)
                           * CAST(l_quantity AS BIGINT) ELSE 0 END)
             AS BIGINT) AS a_sum2,
        CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             AS BIGINT) AS r_cnt,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
             AS BIGINT) AS r_sum,
        CAST(SUM(CASE WHEN l_returnflag = 'R'
                      THEN CAST(l_quantity AS BIGINT)
                           * CAST(l_quantity AS BIGINT) ELSE 0 END)
             AS BIGINT) AS r_sum2
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1
      HAVING SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) > 0
      ORDER BY 1""",
    "ds27_triple_intersect" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n_loyal FROM (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-04-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01')""",
    "ds28_below_avg_brands" -> """
      WITH rev AS (
        SELECT c_nationkey AS nat, p_brand,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                        AS BIGINT)) AS BIGINT) AS rev_c
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      avg_rev AS (
        SELECT nat, CAST(SUM(rev_c) AS BIGINT) AS total_c,
               COUNT(*) AS nb
        FROM rev GROUP BY 1)
      SELECT r.nat, r.p_brand, r.rev_c
      FROM rev r JOIN avg_rev a ON r.nat = a.nat
      WHERE CAST(r.rev_c AS HUGEINT) * 2 * a.nb <= CAST(a.total_c AS HUGEINT)
      ORDER BY r.nat, r.p_brand""",
    "ds29_or_exists_profile" -> """
      WITH active AS (
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'),
      flagged AS (
        SELECT a.o_custkey FROM active a
        WHERE EXISTS (SELECT 1 FROM orders o
                        JOIN lineitem ON l_orderkey = o_orderkey
                      WHERE o.o_custkey = a.o_custkey
                        AND l_returnflag = 'R')
           OR EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = a.o_custkey
                        AND o2.o_totalprice > 400000))
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM flagged JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY 1""",
    "ds30_demographic_bands" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                      AS BIGINT)) AS BIGINT) AS sum_cents
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE ((c_mktsegment = 'BUILDING' AND o_orderstatus = 'F'
              AND l_quantity BETWEEN 10 AND 30)
          OR (c_mktsegment = 'MACHINERY' AND o_orderstatus = 'O'
              AND l_quantity BETWEEN 20 AND 40)
          OR (c_mktsegment = 'AUTOMOBILE' AND o_orderpriority = '1-URGENT'
              AND l_quantity < 15))""",
    "ds31_return_outliers" -> """
      WITH ret AS (
        SELECT c_nationkey AS nat, o_custkey AS cust,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
                        AS BIGINT)) AS BIGINT) AS ret_c
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2),
      nat_avg AS (
        SELECT nat, CAST(SUM(ret_c) AS BIGINT) AS total_c,
               COUNT(*) AS nc
        FROM ret GROUP BY 1)
      SELECT r.nat, r.cust, r.ret_c
      FROM ret r JOIN nat_avg a ON r.nat = a.nat
      WHERE CAST(r.ret_c AS HUGEINT) * 5 * a.nc > CAST(a.total_c AS HUGEINT) * 6
      ORDER BY r.nat, r.cust""",
    "ds32_best_worst" -> """
      WITH perf AS (
        SELECT p_brand,
          CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1),
      rk AS (
        SELECT p_brand, q,
          CAST(RANK() OVER (ORDER BY q DESC, p_brand) AS INT) AS best_rnk,
          CAST(RANK() OVER (ORDER BY q ASC, p_brand) AS INT) AS worst_rnk
        FROM perf)
      SELECT 'best' AS side, best_rnk AS rnk, p_brand, q
      FROM rk WHERE best_rnk <= 5
      UNION ALL
      SELECT 'worst' AS side, worst_rnk AS rnk, p_brand, q
      FROM rk WHERE worst_rnk <= 5
      ORDER BY side, rnk, p_brand""",
    "ds33_channel_band" -> """
      WITH rev AS (
        SELECT p_brand,
          CAST(SUM(CASE WHEN l_returnflag = 'N'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2))
                                  * 100 AS BIGINT) ELSE 0 END)
               AS BIGINT) AS n_c,
          CAST(SUM(CASE WHEN l_returnflag = 'A'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2))
                                  * 100 AS BIGINT) ELSE 0 END)
               AS BIGINT) AS a_c,
          CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2))
                                  * 100 AS BIGINT) ELSE 0 END)
               AS BIGINT) AS r_c
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1)
      SELECT p_brand, n_c, a_c, r_c FROM rev
      WHERE n_c > 0 AND a_c > 0 AND r_c > 0
        AND CAST(n_c AS HUGEINT) * 10 <= CAST(a_c AS HUGEINT) * 13
        AND CAST(a_c AS HUGEINT) * 10 <= CAST(n_c AS HUGEINT) * 13
        AND CAST(n_c AS HUGEINT) * 10 <= CAST(r_c AS HUGEINT) * 13
        AND CAST(r_c AS HUGEINT) * 10 <= CAST(n_c AS HUGEINT) * 13
        AND CAST(a_c AS HUGEINT) * 10 <= CAST(r_c AS HUGEINT) * 13
        AND CAST(r_c AS HUGEINT) * 10 <= CAST(a_c AS HUGEINT) * 13
      ORDER BY p_brand""",
    "ds34_am_pm_ratio" -> """
      WITH b AS (
        SELECT
          CAST(SUM(CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) < 12 THEN 1 ELSE 0 END)
               AS BIGINT) AS am_cnt,
          CAST(SUM(CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) >= 12 THEN 1 ELSE 0 END)
               AS BIGINT) AS pm_cnt
        FROM events WHERE event_type IN ('view', 'click'))
      SELECT am_cnt, pm_cnt,
        CAST(am_cnt AS DOUBLE) / CAST(pm_cnt AS DOUBLE) AS am_pm_ratio
      FROM b""",
    "ds35_excess_discount" -> """
      WITH d AS (
        SELECT l_partkey,
          CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)
            AS disc_bp
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'),
      avg_d AS (
        SELECT l_partkey, CAST(SUM(disc_bp) AS BIGINT) AS tot_bp,
               COUNT(*) AS nl
        FROM d GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_excess,
        CAST(SUM(d.disc_bp) AS BIGINT) AS sum_excess_bp
      FROM d JOIN avg_d a ON d.l_partkey = a.l_partkey
      WHERE CAST(d.disc_bp AS HUGEINT) * 10 * a.nl
            > CAST(a.tot_bp AS HUGEINT) * 13""",
    "ds36_cumulative_compare" -> """
      WITH a AS (
        SELECT l_partkey AS item,
          date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS m,
          CAST(SUM(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
              * 1000000 AS BIGINT))) OVER (PARTITION BY l_partkey
            ORDER BY date_trunc('month', CAST(l_shipdate AS TIMESTAMP))
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cume
        FROM lineitem
        WHERE l_returnflag = 'A'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2),
      b AS (
        SELECT l_partkey AS item,
          date_trunc('month', CAST(l_shipdate AS TIMESTAMP)) AS m,
          CAST(SUM(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6))
              * 1000000 AS BIGINT))) OVER (PARTITION BY l_partkey
            ORDER BY date_trunc('month', CAST(l_shipdate AS TIMESTAMP))
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cume
        FROM lineitem
        WHERE l_returnflag = 'N'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2)
      SELECT item, CAST(m AS TIMESTAMP) AS m, web_sales, store_sales,
        web_cumulative, store_cumulative
      FROM (
        SELECT item, m, web_sales, store_sales,
          MAX(web_sales) OVER (PARTITION BY item ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS web_cumulative,
          MAX(store_sales) OVER (PARTITION BY item ORDER BY m
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS store_cumulative
        FROM (
          SELECT COALESCE(a.item, b.item) AS item,
            COALESCE(a.m, b.m) AS m,
            a.cume AS web_sales, b.cume AS store_sales
          FROM a FULL OUTER JOIN b ON a.item = b.item AND a.m = b.m) x) y
      WHERE web_cumulative > store_cumulative
      ORDER BY item, m LIMIT 100""",
    "ds37_monthly_deviation" -> """
      SELECT p_type, p_brand, n_name, mo, s,
        CAST(tot AS DOUBLE) / CAST(nm AS DOUBLE) AS avg_monthly
      FROM (
        SELECT p_type, p_brand, n_name, mo, s,
          CAST(SUM(s) OVER (PARTITION BY p_type, p_brand, n_name)
            AS BIGINT) AS tot,
          COUNT(*) OVER (PARTITION BY p_type, p_brand, n_name) AS nm
        FROM (
          SELECT p_type, p_brand, n_name,
            CAST(EXTRACT(month FROM CAST(l_shipdate AS TIMESTAMP)) AS INT)
              AS mo,
            CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,6)) * 1000000
              AS BIGINT)) AS BIGINT) AS s
          FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((p_type IN ('SMALL', 'LARGE')
                  AND p_brand IN ('Brand#1', 'Brand#3', 'Brand#5'))
              OR (p_type IN ('ECONOMY', 'PROMO')
                  AND p_brand IN ('Brand#2', 'Brand#4')))
          GROUP BY 1, 2, 3, 4) g) t
      WHERE ABS(CAST(s AS HUGEINT) * nm - tot) * 10
            > CAST(tot AS HUGEINT) * nm
      ORDER BY CAST(CAST(s AS HUGEINT) * nm - tot AS DOUBLE)
          / CAST(nm AS DOUBLE),
        n_name, p_type, p_brand, mo
      LIMIT 100""",
    "ds38_rank_rollup" -> """
      WITH base AS (
        SELECT n_name,
          n_name || '_' || CAST(s_suppkey % 10 AS VARCHAR) AS city,
          CAST(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
              AS BIGINT) *
            (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS DECIMAL(38,0)) AS mu
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'),
      p5 AS (
        SELECT n_name, CAST(SUM(mu) AS DECIMAL(38,0)) AS p
        FROM base GROUP BY n_name),
      top5 AS (
        SELECT n_name FROM (
          SELECT n_name,
            RANK() OVER (ORDER BY p DESC, n_name) AS rnk
          FROM p5) r
        WHERE rnk <= 5),
      kept AS (
        SELECT n_name, city, mu FROM base
        WHERE n_name IN (SELECT n_name FROM top5)),
      agg AS (
        SELECT CAST(SUM(mu) AS DECIMAL(38,0)) AS total_sum,
          n_name AS state, city AS county,
          CAST(0 AS INT) AS lochierarchy, n_name AS pk
        FROM kept GROUP BY n_name, city
        UNION ALL
        SELECT CAST(SUM(mu) AS DECIMAL(38,0)) AS total_sum,
          n_name AS state, 'ALL' AS county,
          CAST(1 AS INT) AS lochierarchy, '*' AS pk
        FROM kept GROUP BY n_name
        UNION ALL
        SELECT CAST(SUM(mu) AS DECIMAL(38,0)) AS total_sum,
          'ALL' AS state, 'ALL' AS county,
          CAST(2 AS INT) AS lochierarchy, '*' AS pk
        FROM kept)
      SELECT CAST(total_sum AS BIGINT) AS total_sum,
        state, county, lochierarchy,
        CAST(RANK() OVER (
          PARTITION BY lochierarchy, pk
          ORDER BY total_sum DESC, state, county) AS INT)
          AS rank_within_parent
      FROM agg
      ORDER BY lochierarchy DESC,
        CASE WHEN lochierarchy = 0 THEN state END,
        rank_within_parent, state, county""",
    "ds39_frequent_best" -> """
      WITH freq AS (
        SELECT l_partkey AS item
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1 HAVING COUNT(DISTINCT l_orderkey) >= 4),
      spend AS (
        SELECT o_custkey AS cust,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS spent
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1),
      mx AS (SELECT MAX(spent) AS m FROM spend),
      best AS (
        SELECT cust FROM spend, mx
        WHERE CAST(spent AS HUGEINT) * 100 > CAST(m AS HUGEINT) * 50),
      gated AS (
        SELECT CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT) AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1998-07-01'
          AND l_partkey IN (SELECT item FROM freq)
          AND o_custkey IN (SELECT cust FROM best))
      SELECT CAST(SUM(cents) AS BIGINT) AS total_cents,
        CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM gated""",
    "ds40_trip_band" -> """
      WITH trips AS (
        SELECT o_orderkey, o_custkey, COUNT(*) AS nl
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority <> '5-LOW'
        GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 6 AND 7)
      SELECT o_custkey AS person, CAST(COUNT(*) AS BIGINT) AS n_trips,
        CAST(SUM(nl) AS BIGINT) AS n_items
      FROM trips GROUP BY 1 HAVING COUNT(*) >= 2
      ORDER BY n_trips DESC, person LIMIT 100""",
    "ds41_class_share" -> """
      WITH g AS (
        SELECT p_type, p_brand,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-03-31'
        GROUP BY 1, 2)
      SELECT p_type, p_brand, rev,
        CAST(rev AS DOUBLE) * 100.0
          / CAST(CAST(SUM(rev) OVER (PARTITION BY p_type) AS BIGINT)
                 AS DOUBLE) AS revenue_ratio
      FROM g ORDER BY p_type, revenue_ratio DESC, p_brand""",
    "ds42_ship_pivot" -> {
      def arm(m: Int, n: Boolean): String = {
        val flag = if (n) "l_returnflag = 'N'" else "l_returnflag <> 'N'"
        val name = (if (n) "n_m" else "r_m") + f"$m%02d"
        s"""CAST(SUM(CASE WHEN EXTRACT(month FROM
           |          CAST(l_shipdate AS TIMESTAMP)) = $m AND $flag
           |          THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
           |               AS BIGINT) ELSE 0 END) AS BIGINT) AS $name"""
          .stripMargin
      }
      val cols = ((1 to 12).map(arm(_, n = true)) ++
        (1 to 12).map(arm(_, n = false))).mkString(",\n        ")
      s"""
      SELECT n_name,
        $cols
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY n_name"""
    },
    "ds43_zip_gate" -> """
      SELECT city, CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2))
          * 100 AS BIGINT)) AS BIGINT) AS rev_cents,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT c_custkey,
                n_name || '_' || CAST(c_custkey % 10 AS VARCHAR) AS city,
                n_name
              FROM customer JOIN nation ON c_nationkey = n_nationkey) c
          ON o_custkey = c.c_custkey
      WHERE l_shipdate >= TIMESTAMP '1997-04-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
        AND (city IN ('NATION_3_7', 'NATION_11_3', 'NATION_20_5')
          OR n_name IN ('NATION_1', 'NATION_7')
          OR l_extendedprice > 90000)
      GROUP BY city ORDER BY city""",
    "ds44_ship_lag" -> """
      SELECT o_orderpriority,
        CAST(SUM(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END) AS BIGINT)
          AS d30,
        CAST(SUM(CASE WHEN lag_days > 30 AND lag_days <= 60
          THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        CAST(SUM(CASE WHEN lag_days > 60 AND lag_days <= 90
          THEN 1 ELSE 0 END) AS BIGINT) AS d90,
        CAST(SUM(CASE WHEN lag_days > 90 AND lag_days <= 120
          THEN 1 ELSE 0 END) AS BIGINT) AS d120,
        CAST(SUM(CASE WHEN lag_days > 120 THEN 1 ELSE 0 END) AS BIGINT)
          AS dmore
      FROM (
        SELECT o_orderpriority,
          datediff('day', CAST(o_orderdate AS TIMESTAMP),
                   CAST(l_shipdate AS TIMESTAMP)) AS lag_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01') x
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "ds45_dow_pivot" -> {
      val cols = (0 to 6).map(d =>
        s"""CAST(SUM(CASE WHEN dayofweek(CAST(l_shipdate AS TIMESTAMP))
           |          = $d
           |          THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
           |               AS BIGINT) ELSE 0 END) AS BIGINT) AS dow$d"""
          .stripMargin).mkString(",\n        ")
      s"""
      SELECT n_name,
        $cols
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY n_name"""
    },
    "ds46_bucket_case" -> {
      // The template's literal 15-scalar-subquery spelling — the
      // equivalence proof for the single-scan Spark plan.
      val bands = Seq((1, 10), (10, 20), (20, 30), (30, 40), (40, 50))
      val thresholds = Seq(11100L, 11950L, 12000L, 11900L, 11900L)
      val cols = bands.zipWithIndex.map { case ((lo, hi), i) =>
        val in = s"l_quantity > $lo AND l_quantity <= $hi"
        s"""CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE $in)
           |       > ${thresholds(i)}
           |  THEN (SELECT CAST(SUM(CAST(CAST(l_extendedprice
           |          AS DECIMAL(28,2)) * 100 AS BIGINT)) AS DOUBLE)
           |        / CAST(COUNT(*) AS DOUBLE)
           |        FROM lineitem WHERE $in)
           |  ELSE (SELECT CAST(SUM(CAST(CAST(l_discount
           |          AS DECIMAL(28,4)) * 10000 AS BIGINT)) AS DOUBLE)
           |        / CAST(COUNT(*) AS DOUBLE)
           |        FROM lineitem WHERE $in)
           |  END AS bucket${i + 1}""".stripMargin
      }.mkString(",\n        ")
      s"""
      SELECT
        $cols"""
    },
    "ds47_week_yoy_pivot" -> {
      // DuckDB dayofweek is 0-based (Sunday=0); the Spark side aligns
      // with its own `dayofweek() - 1` (the ds45 convention).
      val piv = (0 to 6).map(d =>
        s"""CAST(SUM(CASE WHEN dayofweek(CAST(l_shipdate AS TIMESTAMP))
           |       = $d
           |       THEN CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
           |            AS BIGINT) ELSE 0 END) AS BIGINT) AS d$d"""
          .stripMargin).mkString(",\n          ")
      val ratios = (0 to 6).map(d =>
        s"""CASE WHEN y1.d$d = 0 THEN NULL
           |    ELSE CAST(y2.d$d AS DOUBLE) / CAST(y1.d$d AS DOUBLE)
           |    END AS r$d""".stripMargin).mkString(",\n        ")
      s"""
      WITH piv AS (
        SELECT EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS yr,
          weekofyear(CAST(l_shipdate AS TIMESTAMP)) AS wk,
          $piv
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
          AND weekofyear(CAST(l_shipdate AS TIMESTAMP)) BETWEEN 2 AND 51
        GROUP BY 1, 2)
      SELECT CAST(y1.wk AS INT) AS wk,
        $ratios
      FROM piv y1 JOIN piv y2 ON y1.wk = y2.wk
      WHERE y1.yr = 1997 AND y2.yr = 1998
      ORDER BY wk"""
    },
    "ds48_above_avg_parts" -> """
      SELECT n_name,
        CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_cust
      FROM lineitem
        JOIN part p ON l_partkey = p.p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-04-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
        AND CAST(CAST(p.p_retailprice AS DECIMAL(28,2)) * 100 AS BIGINT)
          * (SELECT COUNT(*) FROM part p2
             WHERE p2.p_type = p.p_type) * 1000
        > (SELECT CAST(SUM(CAST(CAST(p2.p_retailprice AS DECIMAL(28,2))
             * 100 AS BIGINT)) AS BIGINT) FROM part p2
           WHERE p2.p_type = p.p_type) * 1005
      GROUP BY n_name
      HAVING COUNT(DISTINCT c_custkey) >= 2
      ORDER BY n_name""",
    "ds49_return_repurchase" -> """
      WITH ret AS (
        SELECT o_custkey AS ck1, l_suppkey AS sk1,
          CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100 AS BIGINT) AS rq,
          o_orderdate AS d1
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'),
      buy AS (
        SELECT o_custkey AS ck2, l_suppkey AS sk2,
          CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100 AS BIGINT) AS bq,
          o_orderdate AS d2
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate < TIMESTAMP '1998-01-01')
      SELECT n_name,
        CAST(COUNT(*) AS BIGINT) AS n_chains,
        CAST(SUM(rq) AS BIGINT) AS ret_qty_cents,
        CAST(SUM(bq) AS BIGINT) AS rebuy_qty_cents
      FROM ret JOIN buy
        ON ck1 = ck2 AND sk1 = sk2 AND d2 > d1
      JOIN supplier ON sk1 = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "ds50_multi_supplier_split" -> """
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l1, lineitem l2
             WHERE l1.l_orderkey = o.o_orderkey
               AND l2.l_orderkey = o.o_orderkey
               AND l1.l_suppkey <> l2.l_suppkey)
           AND EXISTS (SELECT 1 FROM lineitem lr
             WHERE lr.l_orderkey = o.o_orderkey
               AND lr.l_returnflag = 'R')) AS n_ret,
        (SELECT CAST(COALESCE(SUM(CAST(CAST(o_totalprice
             AS DECIMAL(28,2)) * 100 AS BIGINT)), 0) AS BIGINT)
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l1, lineitem l2
             WHERE l1.l_orderkey = o.o_orderkey
               AND l2.l_orderkey = o.o_orderkey
               AND l1.l_suppkey <> l2.l_suppkey)
           AND EXISTS (SELECT 1 FROM lineitem lr
             WHERE lr.l_orderkey = o.o_orderkey
               AND lr.l_returnflag = 'R')) AS cents_ret,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l1, lineitem l2
             WHERE l1.l_orderkey = o.o_orderkey
               AND l2.l_orderkey = o.o_orderkey
               AND l1.l_suppkey <> l2.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem lr
             WHERE lr.l_orderkey = o.o_orderkey
               AND lr.l_returnflag = 'R')) AS n_clean,
        (SELECT CAST(COALESCE(SUM(CAST(CAST(o_totalprice
             AS DECIMAL(28,2)) * 100 AS BIGINT)), 0) AS BIGINT)
         FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l1, lineitem l2
             WHERE l1.l_orderkey = o.o_orderkey
               AND l2.l_orderkey = o.o_orderkey
               AND l1.l_suppkey <> l2.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem lr
             WHERE lr.l_orderkey = o.o_orderkey
               AND lr.l_returnflag = 'R')) AS cents_clean""",
    "ds51_measure_rollup" -> """
      SELECT COALESCE(n_name, 'ALL') AS nation,
        COALESCE(c_mktsegment, 'ALL') AS segment,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_price_cents,
        CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_bal_cents
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment, o_orderpriority)
      ORDER BY nation, segment, priority""",
    "ds52_zip_or_items" -> """
      SELECT n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS BIGINT) AS rev_cents,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN (SELECT c_custkey, n_name,
                n_name || '_' || CAST(c_custkey % 10 AS VARCHAR) AS city
              FROM customer JOIN nation ON c_nationkey = n_nationkey) c
          ON o_custkey = c.c_custkey
      WHERE l_shipdate >= TIMESTAMP '1997-07-01'
        AND l_shipdate < TIMESTAMP '1997-10-01'
        AND (city IN ('NATION_2_4', 'NATION_9_1', 'NATION_17_8')
          OR l_partkey IN (SELECT p_partkey FROM part
                           WHERE p_size IN (11, 17)))
      GROUP BY n_name ORDER BY n_name""",
    "ds53_return_windows" -> """
      WITH a1 AS (
        SELECT p_brand, CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,2))
          * 100 AS BIGINT)) AS BIGINT) AS q1
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY p_brand),
      a2 AS (
        SELECT p_brand, CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,2))
          * 100 AS BIGINT)) AS BIGINT) AS q2
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1997-05-01'
          AND l_shipdate < TIMESTAMP '1997-06-01'
        GROUP BY p_brand),
      a3 AS (
        SELECT p_brand, CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,2))
          * 100 AS BIGINT)) AS BIGINT) AS q3
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
          AND l_shipdate >= TIMESTAMP '1997-07-01'
          AND l_shipdate < TIMESTAMP '1997-08-01'
        GROUP BY p_brand)
      SELECT a1.p_brand, q1, q2, q3,
        CAST(q1 AS DOUBLE) * 3.0 / CAST(q1 + q2 + q3 AS DOUBLE)
          AS share1,
        CAST(q2 AS DOUBLE) * 3.0 / CAST(q1 + q2 + q3 AS DOUBLE)
          AS share2,
        CAST(q3 AS DOUBLE) * 3.0 / CAST(q1 + q2 + q3 AS DOUBLE)
          AS share3
      FROM a1 JOIN a2 ON a1.p_brand = a2.p_brand
        JOIN a3 ON a1.p_brand = a3.p_brand
      ORDER BY a1.p_brand""",
    "ds54_growth_gate" -> """
      WITH yt AS (
        SELECT o_custkey AS ck,
          EXTRACT(year FROM CAST(o_orderdate AS TIMESTAMP)) AS yr,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 's' ELSE 'w' END AS chan,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
        GROUP BY 1, 2, 3)
      SELECT s97.ck AS o_custkey, s97.total AS s97, s98.total AS s98,
        w97.total AS w97, w98.total AS w98
      FROM yt s97
        JOIN yt s98 ON s97.ck = s98.ck
        JOIN yt w97 ON s97.ck = w97.ck
        JOIN yt w98 ON s97.ck = w98.ck
      WHERE s97.yr = 1997 AND s97.chan = 's'
        AND s98.yr = 1998 AND s98.chan = 's'
        AND w97.yr = 1997 AND w97.chan = 'w'
        AND w98.yr = 1998 AND w98.chan = 'w'
        AND s97.total > 0 AND s98.total > 0
        AND w97.total > 0 AND w98.total > 0
        AND w98.total * s97.total > s98.total * w97.total
      ORDER BY o_custkey LIMIT 100""",
    "ds55_cohort_spend" -> """
      WITH cohort AS (
        SELECT DISTINCT o_custkey AS ck
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'),
      spend AS (
        SELECT o_custkey,
          CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS spend_cents
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-04-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND o_custkey IN (SELECT ck FROM cohort)
        GROUP BY 1)
      SELECT spend_cents // 100000 AS band,
        CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM spend GROUP BY 1 ORDER BY 1""",
    "ds56_lookup_concat" -> """
      SELECT c_custkey,
        c_name || ', ' || COALESCE(NULLIF(c_mktsegment, ''), 'NONE')
          || ' (' || n_name || ')' AS customername
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE c_acctbal BETWEEN 1000 AND 3000
        AND r_name = 'EUROPE'
      ORDER BY c_custkey LIMIT 100""",
    "ds57_channel_pnl" -> """
      WITH chan AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'store' ELSE 'web' END AS channel,
          CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT)
            AS cents,
          l_returnflag
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'),
      u AS (
        SELECT channel, cents AS sales, 0 AS ret FROM chan
        WHERE l_returnflag <> 'R'
        UNION ALL
        SELECT channel, 0, cents FROM chan WHERE l_returnflag = 'R')
      SELECT COALESCE(channel, 'TOTAL') AS channel,
        CAST(SUM(sales) AS BIGINT) AS sales_cents,
        CAST(SUM(ret) AS BIGINT) AS returns_cents,
        CAST(SUM(sales) - SUM(ret) AS BIGINT) AS profit_cents
      FROM u GROUP BY ROLLUP (channel) ORDER BY channel""",
    "ds58_band_distinct" -> {
      // the template's literal cross-join of single-band subqueries
      val bands = Seq((0, 10), (10, 20), (20, 30), (30, 40), (40, 50))
      val subs = bands.zipWithIndex.map { case ((lo, hi), i) =>
        s"""(SELECT CAST(COUNT(*) AS BIGINT) AS cnt${i + 1},
           |   CAST(COUNT(DISTINCT CAST(CAST(l_extendedprice
           |     AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT)
           |     AS ndist${i + 1}
           | FROM lineitem
           | WHERE l_quantity > $lo AND l_quantity <= $hi) b${i + 1}"""
          .stripMargin
      }.mkString(",\n        ")
      s"""
      SELECT cnt1, ndist1, cnt2, ndist2, cnt3, ndist3, cnt4, ndist4,
        cnt5, ndist5
      FROM
        $subs"""
    },
    "ds59_union_reagg" -> """
      WITH u AS (
        SELECT p_brand, CAST(CAST(l_extendedprice AS DECIMAL(28,2))
          * 100 AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1997-02-01'
          AND l_shipdate < TIMESTAMP '1997-03-01'
        UNION ALL
        SELECT p_brand, CAST(CAST(l_extendedprice AS DECIMAL(28,2))
          * 100 AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
        UNION ALL
        SELECT p_brand, CAST(CAST(l_extendedprice AS DECIMAL(28,2))
          * 100 AS BIGINT) AS cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1997-10-01'
          AND l_shipdate < TIMESTAMP '1997-11-01')
      SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS total_cents
      FROM u GROUP BY p_brand
      ORDER BY total_cents DESC, p_brand""",
    "ds60_city_change" -> """
      SELECT o_orderkey, c_name, cn.n_name AS cust_nation,
        CAST(COUNT(*) AS BIGINT) AS n_foreign_lines,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS BIGINT) AS foreign_cents
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-05-01'
        AND l_shipdate < TIMESTAMP '1997-06-01'
        AND sn.n_name <> cn.n_name
      GROUP BY o_orderkey, c_name, cn.n_name
      ORDER BY foreign_cents DESC, o_orderkey LIMIT 100""",
    "ds61_brand_month" -> """
      SELECT p_brand,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-12-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY p_brand
      ORDER BY rev_cents DESC, p_brand LIMIT 10""",
    "ds62_quarter_deviation" -> """
      WITH m AS (
        SELECT p_brand,
          EXTRACT(month FROM CAST(l_shipdate AS TIMESTAMP)) AS mo,
          EXTRACT(quarter FROM CAST(l_shipdate AS TIMESTAMP)) AS qt,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS mc
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3),
      q AS (
        SELECT p_brand, mo, mc,
          CAST(SUM(mc) OVER (PARTITION BY p_brand, qt) AS BIGINT) AS qc
        FROM m)
      SELECT p_brand,
        CAST(SUM(CASE WHEN abs(mc * 3 - qc) * 10 > qc THEN 1 ELSE 0 END)
          AS BIGINT) AS n_deviant_months,
        CAST(SUM(mc) AS BIGINT) AS total_cents
      FROM q GROUP BY p_brand ORDER BY p_brand""",
    "ds63_segment_avgs" -> """
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_qty_cents,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_price_cents,
        CAST(SUM(CAST(CAST(l_discount AS DECIMAL(28,4)) * 10000
          AS BIGINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          AS avg_disc_bps
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "ds64_time_band_count" -> """
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) BETWEEN 9 AND 11
        AND event_type = 'view' AND value > 50""",
    "ds65_promo_share" -> """
      SELECT promo_cents, total_cents,
        CAST(promo_cents AS DOUBLE) * 100.0
          / CAST(total_cents AS DOUBLE) AS promo_pct
      FROM
        (SELECT CAST(COALESCE(SUM(CAST(CAST(l_extendedprice
             AS DECIMAL(28,2)) * 100 AS BIGINT)), 0) AS BIGINT)
           AS promo_cents
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_type = 'PROMO'
           AND l_shipdate >= TIMESTAMP '1997-08-01'
           AND l_shipdate < TIMESTAMP '1997-09-01') a,
        (SELECT CAST(SUM(CAST(CAST(l_extendedprice
             AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT)
           AS total_cents
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1997-08-01'
           AND l_shipdate < TIMESTAMP '1997-09-01') b""",
    "ds66_zip_prefix_gate" -> """
      WITH pref AS (
        SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_pref
        FROM customer WHERE c_acctbal > 5000
        GROUP BY 1 HAVING COUNT(*) >= 2),
      nat AS (
        SELECT n_nationkey, n_name
        FROM nation JOIN pref ON n_nationkey = nk
        WHERE substr(n_name, 8, 1) IN ('1', '2'))
      SELECT n_name,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS BIGINT) AS rev_cents,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nat ON c_nationkey = n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1997-04-01'
        AND l_shipdate < TIMESTAMP '1997-07-01'
      GROUP BY n_name ORDER BY n_name""",
    "ds67_cross_year_pairs" -> """
      WITH cross_sales AS (
        SELECT l_partkey AS pk,
          EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS yr,
          CAST(COUNT(*) AS BIGINT) AS cnt,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY 1, 2)
      SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
        CAST(SUM(cs1.rev) AS BIGINT) AS rev97_cents,
        CAST(SUM(cs2.rev) AS BIGINT) AS rev98_cents
      FROM cross_sales cs1
        JOIN cross_sales cs2
          ON cs1.pk = cs2.pk AND cs2.cnt <= cs1.cnt
        JOIN part ON cs1.pk = p_partkey
      WHERE cs1.yr = 1997 AND cs2.yr = 1998
      GROUP BY p_brand ORDER BY p_brand""",
    "ds68_netted_pivot" -> """
      WITH win AS (
        SELECT l_suppkey, l_returnflag,
          CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT)
            AS cents,
          l_shipdate < TIMESTAMP '1997-06-01' AS before
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-05-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'),
      sales AS (
        SELECT l_suppkey AS sk, before,
          CAST(SUM(cents) AS BIGINT) AS gross
        FROM win GROUP BY 1, 2),
      rets AS (
        SELECT l_suppkey AS rk, before AS rb,
          CAST(SUM(cents) AS BIGINT) AS ret
        FROM win WHERE l_returnflag = 'R' GROUP BY 1, 2),
      netted AS (
        SELECT sk, before, gross - COALESCE(ret, 0) AS net
        FROM sales LEFT JOIN rets ON sk = rk AND before = rb)
      SELECT s_name,
        CAST(SUM(CASE WHEN before THEN net ELSE 0 END) AS BIGINT)
          AS before_net,
        CAST(SUM(CASE WHEN NOT before THEN net ELSE 0 END) AS BIGINT)
          AS after_net
      FROM netted JOIN supplier ON sk = s_suppkey
      GROUP BY s_name ORDER BY s_name""",
    "ds69_pair_gate" -> """
      WITH pairs AS (
        SELECT o_custkey AS ck, l_partkey AS pk,
          CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS rev
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2),
      tot AS (
        SELECT CAST(SUM(rev) AS HUGEINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS np
        FROM pairs)
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(rev) AS BIGINT) AS qual_cents
      FROM pairs CROSS JOIN tot
        JOIN customer ON ck = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE CAST(rev AS HUGEINT) * np * 20 > t
      GROUP BY n_name ORDER BY n_name""",
    "ds70_return_loss" -> """
      SELECT o_orderpriority,
        CAST(EXTRACT(month FROM CAST(o_orderdate AS TIMESTAMP)) AS INT)
          AS mo,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100
          AS BIGINT)) AS BIGINT) AS loss_cents,
        CAST(COUNT(*) AS BIGINT) AS n_returns
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "ds71_anti_return_yoy" -> """
      WITH clean AS (
        SELECT l_partkey AS pk,
          EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS yr,
          CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(28,2)) * 100
            AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem l
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
          AND NOT EXISTS (SELECT 1 FROM lineitem r
            WHERE r.l_returnflag = 'R'
              AND r.l_orderkey = l.l_orderkey
              AND r.l_partkey = l.l_partkey)
        GROUP BY 1, 2)
      SELECT p_brand,
        CAST(SUM(y1.qty) AS BIGINT) AS qty97_cents,
        CAST(SUM(y2.qty) AS BIGINT) AS qty98_cents,
        CAST(CAST(SUM(y2.qty) AS BIGINT) AS DOUBLE)
          / CAST(CAST(SUM(y1.qty) AS BIGINT) AS DOUBLE) AS yoy_ratio
      FROM clean y1
        JOIN clean y2 ON y1.pk = y2.pk
        JOIN part ON y1.pk = p_partkey
      WHERE y1.yr = 1997 AND y2.yr = 1998
      GROUP BY p_brand ORDER BY p_brand""",
    "ds72_missing_dim" -> """
      WITH missing AS (
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'store' ELSE 'web' END AS channel,
          CAST(EXTRACT(year FROM CAST(l_shipdate AS TIMESTAMP)) AS INT)
            AS yr,
          CAST(CAST(l_extendedprice AS DECIMAL(28,2)) * 100 AS BIGINT)
            AS cents
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
          AND l_partkey NOT IN
            (SELECT p_partkey FROM part WHERE p_size <= 45)),
      u AS (
        SELECT channel, yr, cents FROM missing WHERE channel = 'store'
        UNION ALL
        SELECT channel, yr, cents FROM missing WHERE channel = 'web')
      SELECT channel, yr, CAST(COUNT(*) AS BIGINT) AS n_missing,
        CAST(SUM(cents) AS BIGINT) AS cents
      FROM u GROUP BY 1, 2 ORDER BY 1, 2""",
    "ds73_inventory_shortfall" -> """
      WITH inv AS (
        SELECT (event_id % 200) + 1 AS ipk,
          CAST(weekofyear(CAST(ts AS TIMESTAMP)) AS INT) AS iwk,
          'WH_' || CAST(user_id % 10 AS VARCHAR) AS warehouse,
          value AS on_hand
        FROM events),
      sales AS (
        SELECT l_partkey, l_orderkey, l_quantity,
          CAST(weekofyear(o_orderdate) AS INT) AS wk
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND CAST(l_shipdate AS TIMESTAMP) >
              CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 DAY
          AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
          AND EXISTS (SELECT 1 FROM customer
            WHERE c_custkey = o_custkey
              AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE'))),
      rets AS (
        SELECT DISTINCT l_orderkey AS rok, l_partkey AS rpk
        FROM lineitem WHERE l_returnflag = 'R')
      SELECT p.p_name AS item_desc, i.warehouse, s.wk,
        CAST(SUM(CASE WHEN pr.p_partkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS no_promo,
        CAST(SUM(CASE WHEN pr.p_partkey IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS promo,
        CAST(SUM(CASE WHEN r.rok IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS returned,
        CAST(COUNT(*) AS BIGINT) AS total_cnt
      FROM sales s
        JOIN inv i ON i.ipk = s.l_partkey AND i.iwk = s.wk
          AND i.on_hand < CAST(s.l_quantity AS DOUBLE) * 10
        JOIN part p ON p.p_partkey = s.l_partkey
        LEFT JOIN (SELECT p_partkey FROM part
                   WHERE p_type = 'PROMO') pr
          ON pr.p_partkey = s.l_partkey
        LEFT JOIN rets r
          ON r.rok = s.l_orderkey AND r.rpk = s.l_partkey
      GROUP BY 1, 2, 3
      ORDER BY total_cnt DESC, item_desc, warehouse, s.wk
      LIMIT 100""")
}
