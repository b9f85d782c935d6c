package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextQueries.{duckMd5num, md5numSql}

/** Scale-pattern operators: the shapes a 100 TB training-data pipeline
  * leans on daily — banded range join, cumulative windows, grouping sets,
  * deterministic stratified sampling, and skew-safe salted aggregation —
  * each oracle-checked against DuckDB.
  */
object ScaleQueries {

  /** Range (band) join: orders binned into price bands via a non-equi
    * join against a small band dimension. The dimension is broadcast, so
    * the fact side never shuffles (BroadcastNestedLoopJoin over 10 rows);
    * with uniform bands this could collapse to arithmetic bucketing, but
    * the general form handles irregular bands — the case that actually
    * needs a range join.
    */
  val rangeJoin = Q(
    "q_range_join",
    (s, dir) => {
      import s.implicits._
      val bands = (0 until 10)
        .map(i => (i.toLong, i * 50000.0, (i + 1) * 50000.0))
        .toDF("band_id", "lo", "hi")
      tbl(s, dir, "orders")
        .join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy("band_id", "lo", "hi")
        .agg(cnt(), sumRound(decPrice(col("o_totalprice"))).as("revenue"))
        .orderBy("band_id")
    },
    Some(s"""WITH bands AS (
              SELECT i AS band_id, i * 50000.0 AS lo, (i + 1) * 50000.0 AS hi
              FROM generate_series(0, 9) t(i))
            SELECT band_id, lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
                   ${sqlSumRound(sqlPrice("o_totalprice"))} AS revenue
            FROM orders JOIN bands
              ON o_totalprice >= lo AND o_totalprice < hi
            GROUP BY band_id, lo, hi ORDER BY band_id"""))

  /** Cumulative window: running revenue per customer in order-key order.
    * The window sum runs over exact decimals (order-independent), so the
    * running values match DuckDB bit-for-bit after round→double.
    */
  val runningTotal = Q(
    "q_running_total",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          decPrice(col("o_totalprice")).as("p"))
        .withColumn("running_revenue",
          round(sum(col("p")).over(w), 2).cast("double"))
        .select("o_custkey", "o_orderkey", "running_revenue")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
                     OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     2) AS DOUBLE) AS running_revenue
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Explicit GROUPING SETS (the general lattice next to ROLLUP's prefix
    * chain and CUBE's powerset): per-status, per-priority, and
    * grand-total levels in one pass, tagged by grouping_id. One shuffle
    * feeds every level via map-side partials over the expanded rows.
    */
  val groupingSets = Q(
    "q_grouping_sets",
    (s, dir) => {
      tbl(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority,
                      CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                      COUNT(*) AS n,
                      CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2)
                        AS DOUBLE) AS revenue
               FROM orders_gs
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY gid, o_orderstatus NULLS FIRST,
                        o_orderpriority NULLS FIRST""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
                   CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2)
                     AS DOUBLE) AS revenue
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
            ORDER BY gid, o_orderstatus NULLS FIRST,
                     o_orderpriority NULLS FIRST"""))

  /** Deterministic stratified sampling: per-language keep rates (20% for
    * the dominant `en`, 60% for the tail) decided by a content-stable
    * hash of the key — reproducible across runs, engines, and cluster
    * sizes, unlike `rand()`-based sampling. This is the downsample-the-
    * dominant-stratum operation every training-data pipeline runs; as a
    * pure filter it pushes into the scan and never shuffles.
    */
  val sampleStratified = Q(
    "q_sample_stratified",
    (s, dir) => tbl(s, dir, "documents")
      .filter(expr(
        s"""${md5numSql("cast(doc_id as string)")} % 10 <
            case when lang = 'en' then 2 else 6 end"""))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, lang, source, n_chars
            FROM documents
            WHERE ${duckMd5num("doc_id::VARCHAR")} % 10 <
                  CASE WHEN lang = 'en' THEN 2 ELSE 6 END
            ORDER BY doc_id"""))

  /** Skew-safe aggregation: two-stage salted sum/count over the hot
    * event_type keys (5 distinct values across every row — the worst
    * aggregation skew shape) via graft.ops.Salting. Stage 1 spreads each
    * hot key over 16 salt buckets, stage 2 merges 16 partials per key.
    * Operands are exact decimals, so the two-stage sum is bit-identical
    * to DuckDB's single-stage oracle.
    */
  val saltedAgg = Q(
    "q_salted_agg",
    (s, dir) => {
      val src = tbl(s, dir, "events")
        .select(col("event_type"), decPrice(col("value")).as("v"))
      graft.ops.Salting.saltedSumCount(src, "event_type", "v")
        .select(col("event_type"),
          round(col("sum_v"), 2).cast("double").as("total_value"),
          col("n"))
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type,
                   ${sqlSumRound(sqlPrice("value"))} AS total_value,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** Date-spine gap fill: dense daily revenue per order status, zeros on
    * days with no orders — the sparse→dense densification every
    * time-series pipeline needs before windowed models. The spine is
    * `sequence()` over the corpus' own [min, max] day range crossed with
    * the status dimension (both tiny — the cross join is broadcast), then
    * a left join back to the per-day aggregate. The fact table is
    * aggregated BEFORE the join, so the outer join touches |days|×|status|
    * rows, never the raw facts.
    */
  val gapFill = Q(
    "q_gap_fill",
    (s, dir) => {
      val orders = tbl(s, dir, "orders")
        .select(col("o_orderstatus").as("status"),
          // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC, so the
          // cast makes unix_micros read the same epoch DuckDB's epoch_us does
          expr("""CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP))
                       div 86400000000 AS BIGINT)""").as("day"),
          decPrice(col("o_totalprice")).as("p"))
      val daily = orders.groupBy("status", "day")
        .agg(cnt(), sumRound(col("p")).as("revenue"))
      val bounds = orders.agg(min("day").as("lo"), max("day").as("hi"))
      val spine = bounds
        .select(explode(expr("sequence(lo, hi)")).as("day"))
        .crossJoin(orders.select("status").distinct())
      spine.join(daily, Seq("status", "day"), "left")
        .select(col("status"), col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
        .orderBy("status", "day")
    },
    Some(s"""WITH o AS (
              SELECT o_orderstatus AS status,
                     epoch_us(o_orderdate) // 86400000000 AS day,
                     o_totalprice FROM orders),
            daily AS (
              SELECT status, day, CAST(COUNT(*) AS BIGINT) AS n,
                     ${sqlSumRound(sqlPrice("o_totalprice"))} AS revenue
              FROM o GROUP BY status, day),
            spine AS (
              SELECT d.day, s.status
              FROM (SELECT unnest(generate_series((SELECT MIN(day) FROM o),
                                                  (SELECT MAX(day) FROM o))) AS day) d
              CROSS JOIN (SELECT DISTINCT status FROM o) s)
            SELECT sp.status, sp.day,
                   COALESCE(dl.n, 0) AS n,
                   COALESCE(dl.revenue, 0.0) AS revenue
            FROM spine sp LEFT JOIN daily dl
              ON sp.status = dl.status AND sp.day = dl.day
            ORDER BY sp.status, sp.day"""))

  /** Ordered string aggregation (LISTAGG): the distinct event types each
    * user has produced, sorted and comma-joined — a deterministic
    * serialization of a set-valued aggregate. `collect_set` keeps the
    * shuffle small (distinct values only); the explicit `sort_array`
    * makes the concatenation order engine-independent (never rely on
    * arrival order of a distributed aggregate).
    */
  val listAgg = Q(
    "q_listagg_events",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("user_id")
      .agg(
        concat_ws(",", sort_array(collect_set(col("event_type"))))
          .as("event_types"),
        cnt("n_events"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
                   string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                     AS event_types,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id ORDER BY user_id"""))

  /** Time-RANGE window frame: each order's trailing-7-day revenue within
    * its customer — a RANGE frame over event time, the semantics row
    * frames cannot express (the frame width varies with timestamp
    * density). Spark's rangeBetween needs a numeric ordering column, so
    * the frame is declared over epoch seconds (which also sidesteps the
    * ns-timestamp oracle hazard); one shuffle on the partition key, frame
    * evaluation streams within each sorted partition.
    */
  val movingWindow = Q(
    "q_moving_window",
    (s, dir) => {
      // o_orderdate is TIMESTAMP_NTZ; the session TZ is pinned UTC, so
      // casting to TIMESTAMP then to epoch seconds matches DuckDB's
      // epoch() over the naive value
      val sec = expr("unix_seconds(cast(o_orderdate as timestamp))")
      val w = Window.partitionBy("o_custkey").orderBy(col("t"))
        .rangeBetween(-7L * 86400, Window.currentRow)
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), sec.as("t"),
          decPrice(col("o_totalprice")).as("p"))
        .withColumn("trailing_7d_revenue",
          round(sum(col("p")).over(w), 2).cast("double"))
        .withColumn("trailing_7d_orders",
          count(lit(1)).over(w))
        .select("o_custkey", "o_orderkey", "t", "trailing_7d_revenue",
          "trailing_7d_orders")
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, epoch(o_orderdate)::BIGINT AS t,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4)))
                     OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)::BIGINT
                           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
                     2) AS DOUBLE) AS trailing_7d_revenue,
                   COUNT(*)
                     OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)::BIGINT
                           RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                     AS trailing_7d_orders
            FROM orders ORDER BY o_custkey, o_orderkey"""))

  /** Explicit Bloom-filter semi-join reduction — the pattern behind
    * Spark's automatic runtime row-level filtering, applied by hand so it
    * works at any size (the auto-injection needs multi-GB scan
    * thresholds): build a compact Bloom filter over the dimension's join
    * keys (one driver-fetched binary — bounded model state, ~128 KB
    * here), then prune the fact scan with `might_contain` BEFORE the
    * shuffle. At 100 TB this is the difference between shuffling the
    * whole fact table and shuffling the ~matching fraction. Bloom false
    * positives survive the pre-filter but are eliminated by the join
    * itself, so the result is EXACTLY the plain join's — which is why the
    * DuckDB oracle is the plain join: the optimization is proven
    * answer-preserving, cross-engine.
    */
  val bloomPrejoin = Q(
    "q_bloom_prejoin",
    (s, dir) => {
      val o = tbl(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val bf = o.agg(expr(
          "bloom_filter_agg(xxhash64(o_orderkey), 100000L, 1048576L)")
          .as("bf"))
        .head().getAs[Array[Byte]]("bf")
      val l = tbl(s, dir, "lineitem")
        .filter(call_function("might_contain",
          typedLit(bf), expr("xxhash64(l_orderkey)")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(cnt("n_lines"),
          sumRound((decPrice(col("l_extendedprice")) *
            oneMinus(col("l_discount"))).as("rev")).as("revenue"))
        .orderBy("l_returnflag")
    },
    Some(s"""SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines,
                   ${sqlSumRound(s"${sqlPrice("l_extendedprice")} * ${sqlOneMinus("l_discount")}")} AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag ORDER BY l_returnflag"""),
    bench = true)

  /** Per-group capping — the corpus-balancing step before training: keep
    * at most K documents per language, chosen by deterministic hash
    * order (not arrival order, which is partitioning-dependent; not
    * rand(), which is irreproducible). The rank window gets Spark's
    * WindowGroupLimit: each partition keeps its own top-K candidates
    * BEFORE the shuffle, so the exchange carries ≤ K rows per partition
    * per group no matter how large a language is. Complements
    * `q_sample_stratified` (rate-based gate, no shuffle, approximate
    * size) with exact-size caps.
    */
  val cappedSample = Q(
    "q_capped_sample",
    (s, dir) => {
      val w = Window.partitionBy("lang")
        .orderBy(col("hkey"), col("doc_id"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          expr("md5num(cast(doc_id as string))").as("hkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 50)
        .select(col("lang"), col("rn"), col("doc_id"))
        .orderBy("lang", "rn")
    },
    Some(s"""SELECT lang, rn, doc_id
            FROM (
              SELECT lang, doc_id,
                     CAST(ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY ${duckMd5num("doc_id::VARCHAR")}, doc_id)
                       AS BIGINT) AS rn
              FROM documents)
            WHERE rn <= 50 ORDER BY lang NULLS FIRST, rn"""))

  val all: Seq[Q] = Seq(rangeJoin, runningTotal, groupingSets,
    sampleStratified, saltedAgg, gapFill, listAgg, bloomPrejoin,
    movingWindow, cappedSample)
}
