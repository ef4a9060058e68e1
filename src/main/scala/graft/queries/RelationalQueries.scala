package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface (SURVEY §2 Part B): scans, filters,
  * aggregations, joins (incl. semi/anti/as-of), windows, sorts/top-k, set
  * ops, grouping sets, and event-time bucketing — all Spark built-ins over
  * the driver tables, each with a DuckDB oracle.
  *
  * Determinism: money is aggregated as integer cents ([[Tables.cents]]);
  * any double output is derived from exact integers by identical expressions
  * on both engines. Every top-k has a total deterministic ordering.
  *
  * Scale: aggregations are partial-agg friendly (no distinct-heavy shapes),
  * dimension joins are broadcast, fact-fact joins shuffle on their keys.
  */
object RelationalQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full-scan aggregation with map-side combine (TPC-H Q1 shape).
    "q1_pricing" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_price_c"),
          sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("sum_disc_price_c4"),
          (sum(col("l_quantity").cast("long")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // Fact-fact join + broadcast dim + agg + deterministic top-k (Q3 shape).
    "q3_shipping" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = tbl(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01"))
      val li = tbl(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").cast("string").as("orderdate"), col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_c4"))
        .orderBy(col("revenue_c4").desc, col("l_orderkey"))
        .limit(10)
    }),

    // 5-way join through the star schema (Q5 shape), broadcast dims.
    "q5_region_volume" -> ((s, dir) => {
      val li = tbl(s, dir, "lineitem")
      val ord = tbl(s, dir, "orders")
      val cust = tbl(s, dir, "customer")
      val nat = tbl(s, dir, "nation")
      val reg = tbl(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount")))).as("revenue_c4"))
    }),

    // Semi + anti join: customers with vs without orders, per segment.
    "q_semi_anti" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
      val ordKeys = tbl(s, dir, "orders").select("o_custkey")
      val withO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with"))
      val withoutO = cust.join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without"))
      withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
        .select(col("c_mktsegment"),
          coalesce(col("n_with"), lit(0L)).as("n_with"),
          coalesce(col("n_without"), lit(0L)).as("n_without"))
    }),

    // Window: per-supplier running quantity, first 5 shipments each.
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      tbl(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .withColumn("running_qty",
          sum(col("l_quantity").cast("long"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .filter(col("rn") <= 5)
        .select(col("l_suppkey"), col("rn").cast("long").as("rn"), col("running_qty"))
    }),

    // RANGE-frame window (value-based frame, the one frame flavor the
    // surface lacked): per customer, the count and cents-sum of their
    // orders falling in the 30 days up to each order's date. RANGE
    // frames are tie-inclusive (all peers of the current ORDER BY value
    // join the frame), so the result is set-determined — no ordering
    // ambiguity — and the sums are integer cents, so the aggregation is
    // order-free. Same shuffle shape as any window: one exchange on the
    // partition key.
    "q_window_range" -> ((s, dir) => {
      val o = tbl(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("price_c"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-30, 0)
      o.select(col("o_custkey"), col("o_orderkey"), col("day"),
        count(lit(1)).over(w).as("n_last30"),
        sum(col("price_c")).over(w).as("sum_last30"))
    }),

    // Ranking top-k per group: 3 priciest parts per brand.
    "q_topk_brand" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(cents(col("p_retailprice")).desc, col("p_partkey"))
      tbl(s, dir, "part")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("p_brand"), col("rk").cast("long").as("rk"),
          col("p_partkey"), cents(col("p_retailprice")).as("price_c"))
    }),

    // Set operations: nations with customers vs with suppliers.
    "q_setops" -> ((s, dir) => {
      val custN = tbl(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
      val suppN = tbl(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
      val both = custN.intersect(suppN).withColumn("op", lit("both"))
      val custOnly = custN.except(suppN).withColumn("op", lit("cust_only"))
      val suppOnly = suppN.except(custN).withColumn("op", lit("supp_only"))
      both.unionByName(custOnly).unionByName(suppOnly)
        .groupBy("op").agg(count(lit(1)).as("n"))
    }),

    // PIVOT: order counts by priority × status. Spark's relational pivot
    // with an explicit value list (no extra distinct-values scan); the
    // oracle expresses the same contract as conditional aggregation.
    // Missing combinations coalesce to 0 like SQL's FILTER count.
    "q_pivot" -> ((s, dir) => {
      tbl(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("priority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    }),

    // Ordered-set aggregate: exact median balance per segment. Computed
    // over integer cents, so the interpolated midpoint is an exact half —
    // bit-identical across engines.
    "q_median" -> ((s, dir) => {
      tbl(s, dir, "customer")
        .groupBy("c_mktsegment")
        .agg(percentile(cents(col("c_acctbal")), lit(0.5)).as("median_bal_c"),
          count(lit(1)).as("n"))
    }),

    // Correlated-subquery shape: customers above their nation's average
    // balance. Comparison done by cross-multiplication of integer cents
    // (bal·n > sum) — exact, no fp division on either engine.
    "q_above_avg" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents(col("c_acctbal")).as("bal_c"))
      val natAgg = cust.groupBy("c_nationkey")
        .agg(sum(col("bal_c")).as("sum_c"), count(lit(1)).as("n"))
      cust.join(broadcast(natAgg), "c_nationkey")
        .filter(col("bal_c") * col("n") > col("sum_c"))
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nationkey"),
          col("bal_c"))
    }),

    // Outer join with null-side aggregation: per customer, order count and
    // spend incl. customers with no orders (null-preserving path).
    "q_outer_join" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
      val ord = tbl(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(cents(col("o_totalprice"))), lit(0L)).as("spend_c"))
    }),

    // Grouping sets / rollup over returnflag × linestatus.
    "q_rollup" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
    }),

    // Full CUBE (all grouping-set combinations, incl. the cross margins
    // ROLLUP omits), with GROUPING() disambiguating real NULLs from
    // subtotal rows.
    "q_cube" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
    }),

    // The GENERAL grouping-sets form (vs rollup's hierarchy and cube's
    // powerset): an explicit non-hierarchical set list — (rf, ls), (ls),
    // () — which neither rollup nor cube expresses. GROUPING() bits
    // disambiguate subtotal rows from real NULLs.
    "q_grouping_sets" -> ((s, dir) => {
      tbl(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity").cast("long")).as("sum_qty"),
          grouping(col("l_returnflag")).cast("long").as("g_rf"),
          grouping(col("l_linestatus")).cast("long").as("g_ls"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("g_rf"), col("g_ls"), col("n"), col("sum_qty"))
    }),

    // Event-time tumbling window (5 min), arithmetic bucketing: identical
    // to Structured Streaming's window() origin (epoch-aligned).
    "q_events_tumbling" -> ((s, dir) => {
      events(s, dir)
        .withColumn("bucket_us", col("state_us") - col("state_us") % 300000000L)
        .groupBy("bucket_us", "event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
    }),

    // Event-time SLIDING window (10 min window, 5 min slide): the real
    // Structured-Streaming window() operator over micros timestamps —
    // each event lands in exactly window/slide = 2 buckets; output keyed
    // by window start in epoch micros (engine-exact integers).
    "q_events_sliding" -> ((s, dir) => {
      events(s, dir)
        .select(timestamp_micros(col("state_us")).as("tts"), col("event_type"))
        .groupBy(window(col("tts"), "10 minutes", "5 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("w_start_us"),
          col("event_type"), col("n"))
    }),

    // As-of join: for each purchase, the user's latest prior click (classic
    // union-and-window formulation — scales as one shuffle + sort per key,
    // no point-lookup joins).
    "q_events_asof" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("state_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("state_us"))
        .withColumn("prev_click_us",
          max(when(col("event_type") === "click", col("state_us"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("prev_click_us"))
    }),

    // Range (interval) join with NO equi key — 100 staggered 6-hour
    // windows (7-hour stride, fixture-in-query) against the event
    // stream, via RangeJoin.joinPointInInterval: intervals explode to
    // the time bins they cover, events bin map-side, EQUI-join on the
    // bin, exact containment re-checked. Spark's native plan for a pure
    // range predicate is the all-pairs BNLJ PlanHygieneSpec bans; the
    // binned form is a plain hash join at any scale. Counts + integer
    // cents per window keep the aggregation order-free.
    "q_events_range_join" -> ((s, dir) => {
      val stride = 7L * 3600 * 1000000
      val width = 6L * 3600 * 1000000
      val base = 1704067200000000L // 2024-01-01T00:00:00Z, epoch micros
      val wins = s.range(0, 100).select(
        col("id").as("win_id"),
        (lit(base) + col("id") * stride).as("w_start"),
        (lit(base) + col("id") * stride + width).as("w_end"))
      val ev = events(s, dir).select(col("state_us"),
        floor(col("value") * 100).cast("long").as("value_c"))
      graft.operators.RangeJoin
        .joinPointInInterval(ev, "state_us", wins, "w_start", "w_end", width)
        .groupBy("win_id")
        .agg(count(lit(1)).as("n_events"), sum(col("value_c")).as("sum_value_c"))
    }),

    // Sessionization: 30-min inactivity gap, per-user session count (lag +
    // cumulative-sum gap detection — the scalable batch formulation).
    "q_events_sessions" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("state_us"), col("event_id"))
      events(s, dir)
        .select(col("user_id"), col("state_us"), col("event_id"))
        .withColumn("new_sess",
          when(col("state_us") - lag(col("state_us"), 1).over(byUser) > 1800000000L
            || lag(col("state_us"), 1).over(byUser).isNull, 1L).otherwise(0L))
        .groupBy("user_id")
        .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Cohort retention: users grouped by first-active day, activity counted
    // per whole-day offset. Pure integer day arithmetic on state_us — exact
    // on both engines. Scale: the (user, day) distinct and the cohort min
    // are each one shuffle on user_id; the final rollup is a tiny
    // (cohort, offset) hash agg with map-side combine.
    "q_events_retention" -> ((s, dir) => {
      val days = events(s, dir)
        .select(col("user_id"), expr("state_us div 86400000000").as("day"))
        .distinct()
      val cohort = days.groupBy("user_id").agg(min(col("day")).as("c0"))
      days.join(cohort, "user_id")
        .groupBy(col("c0").as("cohort_day"), (col("day") - col("c0")).as("offset_days"))
        .agg(count(lit(1)).as("n_active"))
    }),

    // Correlation/covariance on the exact-integer lattice: x = quantity,
    // y = discount cents. All six moment SUMS are exact BIGINTs (one
    // map-side-combined hash agg, no second pass); with x ≤ 50, y ≤ 10
    // the sums stay under 2^63 through ~10^13 rows. The DERIVED products
    // (n·Sxy, Sx·Sy, …) grow as ~500·n² and would overflow Long at
    // roughly n ≈ 1.4e8 rows per group (~sf100), so they are formed in
    // DOUBLE — cast each operand first, then multiply/subtract — by the
    // identical closed formula on both engines, keeping the final double
    // bit-equal while never tripping ANSI overflow at scale.
    "q_corr_stats" -> ((s, dir) => {
      val x = col("l_quantity").cast("long")
      val y = cents(col("l_discount"))
      val nD = col("n").cast("double")
      val sxD = col("sum_x").cast("double"); val syD = col("sum_y").cast("double")
      val sxxD = col("sum_xx").cast("double"); val syyD = col("sum_yy").cast("double")
      val sxyD = col("sum_xy").cast("double")
      tbl(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(x).as("sum_x"), sum(y).as("sum_y"),
          sum(x * x).as("sum_xx"), sum(y * y).as("sum_yy"),
          sum(x * y).as("sum_xy"))
        .select(col("l_returnflag"), col("n"),
          col("sum_x"), col("sum_y"), col("sum_xx"), col("sum_yy"), col("sum_xy"),
          ((nD * sxyD - sxD * syD) /
            (sqrt(nD * sxxD - sxD * sxD) * sqrt(nD * syyD - syD * syD)))
            .as("corr_qd"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
                CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
                    (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_c4,
                CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_qty,
                COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_shipping" ->
      """SELECT l_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
                o_orderpriority,
                CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
                    (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""",
    "q5_region_volume" ->
      """SELECT n_name,
                CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) *
                    (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name""",
    "q_semi_anti" ->
      """SELECT c_mktsegment,
                COALESCE(CAST(SUM(CASE WHEN has_o THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_with,
                COALESCE(CAST(SUM(CASE WHEN has_o THEN 0 ELSE 1 END) AS BIGINT), 0) AS n_without
         FROM (SELECT c_mktsegment,
                      EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) AS has_o
               FROM customer)
         GROUP BY c_mktsegment""",
    "q_window_running" ->
      """SELECT l_suppkey, rn, running_qty FROM (
           SELECT l_suppkey,
                  row_number() OVER w AS rn,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER
                    (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_qty
           FROM lineitem
           WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber))
         WHERE rn <= 5""",
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, day,
                CAST(COUNT(*) OVER w AS BIGINT) AS n_last30,
                CAST(SUM(price_c) OVER w AS BIGINT) AS sum_last30
         FROM (SELECT o_custkey, o_orderkey,
                      CAST(date_diff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
                      CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
               FROM orders)
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""",
    "q_topk_brand" ->
      """SELECT p_brand, rk, p_partkey, price_c FROM (
           SELECT p_brand, p_partkey,
                  CAST(round(p_retailprice*100) AS BIGINT) AS price_c,
                  row_number() OVER (PARTITION BY p_brand
                    ORDER BY CAST(round(p_retailprice*100) AS BIGINT) DESC, p_partkey) AS rk
           FROM part)
         WHERE rk <= 3""",
    "q_setops" ->
      """SELECT op, COUNT(*) AS n FROM (
           SELECT nationkey, 'both' AS op FROM
             (SELECT DISTINCT c_nationkey AS nationkey FROM customer
              INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
           UNION ALL
           SELECT nationkey, 'cust_only' FROM
             (SELECT DISTINCT c_nationkey AS nationkey FROM customer
              EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
           UNION ALL
           SELECT nationkey, 'supp_only' FROM
             (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
              EXCEPT SELECT DISTINCT c_nationkey FROM customer)
         ) GROUP BY op""",
    "q_pivot" ->
      """SELECT o_orderpriority AS priority,
                CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
                CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
                CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
         FROM orders GROUP BY 1""",
    "q_median" ->
      """SELECT c_mktsegment,
                quantile_cont(CAST(round(c_acctbal*100) AS BIGINT), 0.5) AS median_bal_c,
                COUNT(*) AS n
         FROM customer GROUP BY c_mktsegment""",
    "q_above_avg" ->
      """SELECT c.c_custkey, CAST(c.c_nationkey AS BIGINT) AS nationkey,
                CAST(round(c.c_acctbal*100) AS BIGINT) AS bal_c
         FROM customer c
         JOIN (SELECT c_nationkey,
                      CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_c,
                      COUNT(*) AS n
               FROM customer GROUP BY c_nationkey) a
           ON c.c_nationkey = a.c_nationkey
         WHERE CAST(round(c.c_acctbal*100) AS BIGINT) * a.n > a.sum_c""",
    "q_outer_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
                COALESCE(CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT), 0)
                  AS spend_c
         FROM customer
         LEFT JOIN (SELECT * FROM orders
                    WHERE o_orderdate >= TIMESTAMP '1997-01-01') o
           ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                COALESCE(l_linestatus, 'ALL') AS linestatus,
                COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "q_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                COALESCE(l_linestatus, 'ALL') AS linestatus,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
                COALESCE(l_linestatus, 'ALL') AS linestatus,
                CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""",
    "q_events_tumbling" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 300000000 AS bucket_us,
                event_type,
                COUNT(*) AS n,
                CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
         FROM events GROUP BY 1, 2""",
    "q_events_sliding" ->
      """SELECT w_start_us, event_type, COUNT(*) AS n FROM (
           SELECT unnest([(epoch_us(ts) // 300000000) * 300000000,
                          (epoch_us(ts) // 300000000) * 300000000 - 300000000])
                    AS w_start_us,
                  event_type
           FROM events)
         GROUP BY 1, 2""",
    "q_events_range_join" ->
      """WITH wins AS (
           SELECT i AS win_id,
                  1704067200000000 + i * 25200000000 AS w_start,
                  1704067200000000 + i * 25200000000 + 21600000000 AS w_end
           FROM range(0, 100) t(i)),
         ev AS (SELECT epoch_us(ts) AS state_us,
                       CAST(floor(value * 100) AS BIGINT) AS value_c
                FROM events)
         SELECT win_id, CAST(COUNT(*) AS BIGINT) AS n_events,
                CAST(SUM(value_c) AS BIGINT) AS sum_value_c
         FROM wins JOIN ev ON state_us >= w_start AND state_us < w_end
         GROUP BY win_id""",
    "q_events_asof" ->
      """SELECT event_id, user_id, prev_click_us FROM (
           SELECT event_id, user_id, event_type,
                  MAX(CASE WHEN event_type = 'click' THEN state_us END) OVER
                    (PARTITION BY user_id ORDER BY state_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_us
           FROM (SELECT event_id, user_id, event_type, epoch_us(ts) AS state_us FROM events))
         WHERE event_type = 'purchase'""",
    "q_events_sessions" ->
      """SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
           SELECT user_id,
                  CASE WHEN state_us - lag(state_us) OVER
                         (PARTITION BY user_id ORDER BY state_us, event_id) > 1800000000
                       OR lag(state_us) OVER
                         (PARTITION BY user_id ORDER BY state_us, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_sess
           FROM (SELECT user_id, epoch_us(ts) AS state_us, event_id FROM events))
         GROUP BY user_id""",
    "q_events_retention" ->
      """WITH days AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
         cohort AS (SELECT user_id, MIN(day) AS c0 FROM days GROUP BY user_id)
         SELECT c.c0 AS cohort_day, d.day - c.c0 AS offset_days,
                COUNT(*) AS n_active
         FROM days d JOIN cohort c USING (user_id)
         GROUP BY 1, 2""",
    "q_corr_stats" ->
      """WITH s AS (
           SELECT l_returnflag,
                  COUNT(*) AS n,
                  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
                  CAST(SUM(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_y,
                  CAST(SUM(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_xx,
                  CAST(SUM(CAST(round(l_discount*100) AS BIGINT)*CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_yy,
                  CAST(SUM(CAST(l_quantity AS BIGINT)*CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_xy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy,
                (CAST(n AS DOUBLE)*CAST(sum_xy AS DOUBLE)
                   - CAST(sum_x AS DOUBLE)*CAST(sum_y AS DOUBLE))
                  / (sqrt(CAST(n AS DOUBLE)*CAST(sum_xx AS DOUBLE)
                            - CAST(sum_x AS DOUBLE)*CAST(sum_x AS DOUBLE))
                     * sqrt(CAST(n AS DOUBLE)*CAST(sum_yy AS DOUBLE)
                              - CAST(sum_y AS DOUBLE)*CAST(sum_y AS DOUBLE))) AS corr_qd
         FROM s"""
  )
}
