package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** Second relational wave: as-of join, rollup, pivot, set operations, and
  * the custom exact-distinct aggregator — each oracle-checked.
  */
object RelationalQueries2 {

  /** As-of join: every click event annotated with the user's most recent
    * purchase (value + event id) at or before the click. Spark side uses
    * the union+window operator (graft.ops.AsOfJoin); the oracle uses
    * DuckDB's native ASOF JOIN — two independent implementations of the
    * same semantics.
    */
  val asofJoin = Q(
    "q_asof_join",
    (s, dir) => {
      val events = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), tsMicros.as("tus"))
      val clicks = events.filter(col("event_type") === "click")
        .select("event_id", "user_id", "tus")
      // unique per (user, tus): keep the highest event_id
      val purchases = events.filter(col("event_type") === "purchase")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id", "tus").orderBy(col("event_id").desc)))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("tus"),
          col("event_id").as("purchase_id"), col("value").as("purchase_value"))
      AsOfJoin.asOf(clicks, purchases, key = "user_id", ts = "tus",
        rightCols = Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(round(col("asof_purchase_value"), 6), lit(0.0))
            .as("purchase_value"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
              SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus
              FROM events),
            clicks AS (
              SELECT event_id, user_id, tus FROM e WHERE event_type = 'click'),
            purchases AS (
              SELECT user_id, tus, event_id AS purchase_id,
                     value AS purchase_value
              FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, tus
                      ORDER BY event_id DESC) AS rn
                    FROM e WHERE event_type = 'purchase')
              WHERE rn = 1)
            SELECT c.event_id, c.user_id,
                   COALESCE(p.purchase_id, -1) AS purchase_id,
                   COALESCE(ROUND(p.purchase_value, 6), 0.0) AS purchase_value
            FROM clicks c ASOF LEFT JOIN purchases p
              ON c.user_id = p.user_id AND p.tus <= c.tus
            ORDER BY c.event_id"""),
    bench = true)

  /** The same point-in-time lookup through the NATIVE custom operator
    * (graft.plans.AsOfJoinExec: LogicalPlan + Strategy + sort-merge
    * SparkPlan, injected via SparkSessionExtensions) — third independent
    * implementation of the semantics, checked against the same DuckDB
    * ASOF JOIN oracle as q_asof_join.
    */
  val asofNative = Q(
    "q_asof_native",
    (s, dir) => {
      val events = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), tsMicros.as("tus"))
      val clicks = events.filter(col("event_type") === "click")
        .select("event_id", "user_id", "tus")
      // one purchase per (user, instant), highest event_id wins — same
      // LWW-aggregate shape as q_resample_ffill: the explicit user_id
      // exchange serves BOTH the (user_id, tus) dedup (clustering by a
      // key subset satisfies the aggregate) and the native as-of join's
      // right-side distribution, where the window form paid a second
      // exchange; event_id is unique, so the struct max never compares
      // `value` and the winner is identical
      val purchases = events.filter(col("event_type") === "purchase")
        .repartition(col("user_id"))
        .groupBy("user_id", "tus")
        .agg(max(struct(col("event_id"), col("value"))).as("w"))
        .select(col("user_id"), col("tus"),
          col("w.event_id").as("purchase_id"),
          col("w.value").as("purchase_value"))
      graft.plans.AsOfJoinNative.asOf(clicks, purchases,
        key = "user_id", ts = "tus",
        rightCols = Seq("purchase_id", "purchase_value"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_purchase_id"), lit(-1L)).as("purchase_id"),
          coalesce(round(col("asof_purchase_value"), 6), lit(0.0))
            .as("purchase_value"))
        .orderBy("event_id")
    },
    asofJoin.oracle,
    bench = true)

  /** Rollup: revenue at (status, priority), (status), and grand-total
    * grouping levels in one pass — map-side partials feed every level.
    */
  val rollupRevenue = Q(
    "q_rollup_revenue",
    (s, dir) => tbl(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(cnt(), sumRound(decPrice(col("o_totalprice"))).as("revenue"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first),
    Some(s"""SELECT o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ${sqlSumRound(sqlPrice("o_totalprice"))} AS revenue
            FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            ORDER BY o_orderstatus ASC NULLS FIRST,
                     o_orderpriority ASC NULLS FIRST"""))

  /** Pivot: order counts per priority, statuses as columns (explicit value
    * list keeps the output schema static — required for determinism and
    * at-scale planning).
    */
  val pivotStatus = Q(
    "q_pivot_status",
    (s, dir) => tbl(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_orders"),
        coalesce(col("O"), lit(0L)).as("o_orders"),
        coalesce(col("P"), lit(0L)).as("p_orders"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
                   CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_orders,
                   CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_orders,
                   CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_orders
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Unpivot (melt): the inverse of the pivot above — the wide
    * status-count table folded back to long form. Wide→long is a
    * row-local transform (each input row fans out to k output rows, no
    * shuffle); Spark plans `Expand`, the same operator grouping-sets
    * lattices use.
    */
  val unpivotStatus = Q(
    "q_unpivot_status",
    (s, dir) => {
      val wide = tbl(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_orders"),
          coalesce(col("O"), lit(0L)).as("o_orders"),
          coalesce(col("P"), lit(0L)).as("p_orders"))
      wide.unpivot(
        Array(col("o_orderpriority")),
        Array(col("f_orders"), col("o_orders"), col("p_orders")),
        "status_col", "n")
        .orderBy("o_orderpriority", "status_col")
    },
    Some("""WITH wide AS (
              SELECT o_orderpriority,
                     CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS f_orders,
                     CAST(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS o_orders,
                     CAST(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS p_orders
              FROM orders GROUP BY o_orderpriority)
            SELECT o_orderpriority, status_col, n
            FROM wide UNPIVOT (n FOR status_col IN (f_orders, o_orders, p_orders))
            ORDER BY o_orderpriority, status_col"""))

  /** Set operations at (user, day) granularity: days a user both clicked
    * and viewed but did not purchase — INTERSECT then EXCEPT.
    */
  val setOps = Q(
    "q_set_ops",
    (s, dir) => {
      val events = tbl(s, dir, "events")
      def userDays(t: String) =
        events.filter(col("event_type") === t)
          .select(col("user_id"),
            expr("(ts div 1000) div 86400000000").as("day"))
          .distinct()
      userDays("click").intersect(userDays("view"))
        .except(userDays("purchase"))
        .orderBy("user_id", "day")
    },
    Some("""WITH c AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                       FROM events WHERE event_type = 'click'),
                 v AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                       FROM events WHERE event_type = 'view'),
                 p AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
                       FROM events WHERE event_type = 'purchase')
            (SELECT * FROM c INTERSECT SELECT * FROM v)
            EXCEPT SELECT * FROM p
            ORDER BY user_id, day"""))

  /** Custom typed Aggregator (UDAF surface): exact distinct event types
    * per user via a set-buffer aggregate; oracle is COUNT(DISTINCT).
    */
  val customAggregator = Q(
    "q_user_distinct_events",
    (s, dir) => {
      val distinctEvents = udaf(new graft.functions.CountDistinctExact())
      tbl(s, dir, "events")
        .groupBy("user_id")
        .agg(distinctEvents(col("event_type")).as("n_event_types"),
          cnt("n_events"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id,
                   CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Cube: all grouping combinations of (returnflag, linestatus) in one
    * pass — the full grouping-sets lattice next to rollup's prefix chain.
    */
  val cubeVolume = Q(
    "q_cube_volume",
    (s, dir) => tbl(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(cnt(), sumRound(decPrice(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some(s"""SELECT l_returnflag, l_linestatus,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   ${sqlSumRound(sqlPrice("l_quantity"))} AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag ASC NULLS FIRST,
                     l_linestatus ASC NULLS FIRST"""))

  /** ntile quartiles of customers by order revenue (deterministic under a
    * total ordering; both engines give earlier tiles the extra rows).
    *
    * Computed WITHOUT a global window: `ntile(4).over(Window.orderBy(..))`
    * coalesces the whole dataset into one partition (Spark warns about
    * it); `ops/GlobalRank.ntile` keeps the sort range-partitioned and
    * derives the tile from a distributed global row number via the exact
    * NTILE identity — the oracle still runs real SQL NTILE, so the
    * hash-match proves the identity.
    */
  val ntileSpend = Q(
    "q_ntile_spend",
    (s, dir) => {
      val rev = tbl(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sumRound(decPrice(col("o_totalprice"))).as("revenue"))
      graft.ops.GlobalRank.ntile(rev,
          Seq(col("revenue").desc, col("o_custkey")), 4, "quartile")
        .select("o_custkey", "revenue", "quartile")
        .orderBy("o_custkey")
    },
    Some(s"""WITH rev AS (
              SELECT o_custkey, ${sqlSumRound(sqlPrice("o_totalprice"))} AS revenue
              FROM orders GROUP BY o_custkey)
            SELECT o_custkey, revenue,
                   CAST(NTILE(4) OVER (ORDER BY revenue DESC, o_custkey) AS BIGINT) AS quartile
            FROM rev ORDER BY o_custkey"""))

  /** TPC-H Q14-style promo revenue share: conditional aggregation over a
    * broadcast dimension join — the two exact-decimal sums divide AFTER
    * aggregation, so the single output row is deterministic across
    * engines and partitionings.
    */
  val promoRevenue = Q(
    "q_promo_revenue",
    (s, dir) => {
      val part = tbl(s, dir, "part").select("p_partkey", "p_type")
      val discPrice =
        decPrice(col("l_extendedprice")) * oneMinus(col("l_discount"))
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .agg(
          sumRound(when(col("p_type") === "PROMO", discPrice)
            .otherwise(lit(0).cast(org.apache.spark.sql.types
              .DecimalType(22, 8)))).as("promo_revenue"),
          sumRound(discPrice).as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
            .as("promo_pct"))
    },
    Some(s"""WITH agg AS (
              SELECT
                ${sqlSumRound(s"CASE WHEN p_type = 'PROMO' THEN ${sqlPrice("l_extendedprice")} * ${sqlOneMinus("l_discount")} ELSE CAST(0 AS DECIMAL(22,8)) END")} AS promo_revenue,
                ${sqlSumRound(s"${sqlPrice("l_extendedprice")} * ${sqlOneMinus("l_discount")}")} AS total_revenue
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
            SELECT promo_revenue, total_revenue,
                   ROUND(100.0 * promo_revenue / total_revenue, 6) AS promo_pct
            FROM agg"""))

  /** TPC-H Q18-style large orders: aggregate-then-having produces a small
    * key set that semi-joins back into the fact/dim chain — at scale the
    * HAVING filter collapses the orderkey domain before any wide join.
    */
  val largeOrders = Q(
    "q_large_orders",
    (s, dir) => {
      val bigKeys = tbl(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sumRound(decPrice(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      val orders = tbl(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      val cust = tbl(s, dir, "customer").select("c_custkey", "c_name")
      bigKeys
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          decPrice(col("o_totalprice")).cast("double").as("total_price"),
          col("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                   CAST(CAST(o_totalprice AS DECIMAL(14,4)) AS DOUBLE) AS total_price,
                   CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,4))), 2) AS DOUBLE) AS sum_qty
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
            HAVING CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,4))), 2) AS DOUBLE) > 250
            ORDER BY sum_qty DESC, o_orderkey"""))

  /** TPC-H Q10-style returned-item revenue: selective fact filter →
    * order/customer joins → global top-20 by lost revenue, planned as
    * TakeOrdered (per-partition partial top-k, never a full sort).
    */
  val returnedRevenue = Q(
    "q_returned_revenue",
    (s, dir) => {
      val l = tbl(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      val orders = tbl(s, dir, "orders").select("o_orderkey", "o_custkey")
      val cust = tbl(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
      l.join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
          sumRound(decPrice(col("l_extendedprice")) *
            oneMinus(col("l_discount"))).as("lost_revenue"),
          cnt("n_returned_lines"))
        .orderBy(col("lost_revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name,
                   ${sqlSumRound(s"${sqlPrice("l_extendedprice")} * ${sqlOneMinus("l_discount")}")} AS lost_revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_returned_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE l_returnflag = 'R'
            GROUP BY c_custkey, c_name
            ORDER BY lost_revenue DESC, c_custkey
            LIMIT 20"""))

  val all: Seq[Q] = Seq(asofJoin, asofNative, rollupRevenue, pivotStatus,
    unpivotStatus, setOps, customAggregator, cubeVolume, ntileSpend,
    promoRevenue, largeOrders, returnedRevenue)
}
