package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational analytics over the star schema — the engine's general-purpose
  * query surface (scan/filter/agg/join/window/top-k), written for scale:
  *
  *   - dimension tables (`region`, `nation`, `supplier`, `customer` at the
  *     fact:dim ratios here) are explicitly `broadcast()` so the fact table
  *     never shuffles for the join;
  *   - aggregations are declared via groupBy/agg so Catalyst plans partial
  *     (map-side) aggregation before the exchange;
  *   - money arithmetic is exact decimal (see package doc) so results are
  *     deterministic under any partitioning / AQE re-plan.
  */
object RelationalQueries {

  private val disc1 = oneMinus(col("l_discount"))
  private val tax1 = onePlus(col("l_tax"))
  private val discPrice = decPrice(col("l_extendedprice")) * disc1
  private val sqlDiscPrice =
    s"${sqlPrice("l_extendedprice")} * ${sqlOneMinus("l_discount")}"

  /** TPC-H Q1-style pricing summary: full-scan aggregate with map-side
    * partial agg; the canonical wide-scan benchmark query.
    */
  val q1PricingSummary = Q(
    "q1_pricing_summary",
    (s, dir) => tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumRound(decPrice(col("l_quantity"))).as("sum_qty"),
        sumRound(decPrice(col("l_extendedprice"))).as("sum_base_price"),
        sumRound(discPrice).as("sum_disc_price"),
        sumRound(discPrice.cast(DecimalType(24, 8)) * tax1).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        cnt("count_order"))
      .orderBy("l_returnflag", "l_linestatus"),
    Some(s"""SELECT l_returnflag, l_linestatus,
                   ${sqlSumRound(sqlPrice("l_quantity"))} AS sum_qty,
                   ${sqlSumRound(sqlPrice("l_extendedprice"))} AS sum_base_price,
                   ${sqlSumRound(sqlDiscPrice)} AS sum_disc_price,
                   ${sqlSumRound(s"CAST($sqlDiscPrice AS DECIMAL(24,8)) * ${sqlOnePlus("l_tax")}")} AS sum_charge,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_extendedprice), 4) AS avg_price,
                   ROUND(AVG(l_discount), 4) AS avg_disc,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    bench = true)

  /** TPC-H Q3-style shipping priority: selective dim filter broadcast into
    * two fact joins, then top-10 by revenue (rounded-exact, tie-broken).
    */
  val q3ShippingPriority = Q(
    "q3_shipping_priority",
    (s, dir) => {
      val cust = tbl(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val orders = tbl(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val line = tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      line
        .join(orders.join(broadcast(cust),
          col("o_custkey") === col("c_custkey")).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(sumRound(discPrice).as("revenue"))
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
                   ${sqlSumRound(sqlDiscPrice)} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1996-07-01 00:00:00'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey LIMIT 10"""),
    bench = true)

  /** TPC-H Q5-style local-supplier volume: 5-way join where every dimension
    * is broadcast; only lineitem-orders shuffles (on the join key).
    */
  val q5LocalSupplier = Q(
    "q5_local_supplier",
    (s, dir) => {
      val nation = tbl(s, dir, "nation").select("n_nationkey", "n_name")
      val cust = tbl(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = tbl(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val orders = tbl(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val line = tbl(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      line
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sumRound(discPrice).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some(s"""SELECT n_name, ${sqlSumRound(sqlDiscPrice)} AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY n_name ORDER BY revenue DESC, n_name"""),
    bench = true)

  /** TPC-H Q6-style revenue forecast: tight scan with every predicate pushed
    * to parquet; single-row exact-decimal result.
    */
  val q6Revenue = Q(
    "q6_revenue",
    (s, dir) => tbl(s, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
      .agg(sumRound(decPrice(col("l_extendedprice")) * decRate(col("l_discount")))
        .as("revenue")),
    Some(s"""SELECT ${sqlSumRound(s"${sqlPrice("l_extendedprice")} * CAST(l_discount AS DECIMAL(7,4))")} AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24"""),
    bench = true)

  /** Top-k per group via rank window: top-3 customers by order revenue
    * within each market segment.
    */
  val topCustomers = Q(
    "q_top_customers",
    (s, dir) => {
      val cust = tbl(s, dir, "customer")
        .select("c_custkey", "c_name", "c_mktsegment")
      val orders = tbl(s, dir, "orders").select("o_custkey", "o_totalprice")
      val rev = orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "c_custkey", "c_name")
        .agg(sumRound(decPrice(col("o_totalprice"))).as("revenue"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("revenue").desc, col("c_custkey"))
      rev.withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "c_custkey", "c_name", "revenue")
        .orderBy("c_mktsegment", "rnk", "c_custkey")
    },
    Some(s"""WITH rev AS (
              SELECT c_mktsegment, c_custkey, c_name,
                     ${sqlSumRound(sqlPrice("o_totalprice"))} AS revenue
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment, c_custkey, c_name)
            SELECT c_mktsegment,
                   CAST(RANK() OVER (PARTITION BY c_mktsegment
                     ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rnk,
                   c_custkey, c_name, revenue
            FROM rev QUALIFY rnk <= 3
            ORDER BY c_mktsegment, rnk, c_custkey"""))

  /** A9-style status summary with exact-decimal totals. */
  val statusSummary = Q(
    "q_status_summary",
    (s, dir) => tbl(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(cnt(), sumRound(decPrice(col("o_totalprice"))).as("sum_total"))
      .orderBy("o_orderstatus"),
    Some(s"""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
                   ${sqlSumRound(sqlPrice("o_totalprice"))} AS sum_total
            FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Q5-analog parent→child traversal: per-parent child count + rollup. */
  val hierarchyChildren = Q(
    "q_hierarchy_children",
    (s, dir) => tbl(s, dir, "orders")
      .filter(col("o_orderstatus") === "O")
      .select("o_orderkey")
      .join(tbl(s, dir, "lineitem").select("l_orderkey", "l_quantity"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(cnt("n_children"), sumRound(decPrice(col("l_quantity"))).as("sum_qty"))
      .orderBy("o_orderkey"),
    Some(s"""SELECT o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_children,
                   ${sqlSumRound(sqlPrice("l_quantity"))} AS sum_qty
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'O'
            GROUP BY o_orderkey ORDER BY o_orderkey"""))

  /** Dimension-table aggregate (part catalog stats). */
  val partBrandAgg = Q(
    "q_part_brand_agg",
    (s, dir) => tbl(s, dir, "part")
      .groupBy("p_brand")
      .agg(cnt(), sumRound(decPrice(col("p_retailprice"))).as("sum_price"),
        round(avg("p_size"), 4).as("avg_size"))
      .orderBy("p_brand"),
    Some(s"""SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                   ${sqlSumRound(sqlPrice("p_retailprice"))} AS sum_price,
                   ROUND(AVG(p_size), 4) AS avg_size
            FROM part GROUP BY p_brand ORDER BY p_brand"""))

  val all: Seq[Q] = Seq(
    q1PricingSummary, q3ShippingPriority, q5LocalSupplier, q6Revenue,
    topCustomers, statusSummary, hierarchyChildren, partBrandAgg)
}
