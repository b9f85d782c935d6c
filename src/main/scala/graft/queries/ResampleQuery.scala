package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid resampling with forward fill — the time-series
  * normalization step (irregular event times → one observation per key
  * per day, last value carried forward) that feeds feature stores and
  * training windows.
  *
  * Composition, not a new operator: a day spine (bounds agg × distinct
  * keys, both tiny frames) AS-OF-joined to the deduplicated event stream
  * with the engine's native [[graft.plans.AsOfJoinNative]] operator —
  * the same partition-local merge used by `q_asof_native`, here in its
  * second role. Scale shape: the spine is |keys|·|days| rows (grid-
  * sized, not event-sized), events dedup with a keyed window, and the
  * as-of join shuffles both sides once on the key. The DuckDB oracle is
  * a literal `ASOF LEFT JOIN`, so the custom operator's semantics are
  * pinned against an independent engine's native implementation of the
  * same join type.
  *
  * Determinism: events are first reduced to one row per (user, instant)
  * (highest event_id wins — same rule as `q_asof_join`); the sample
  * point is end-of-day (`(day+1)·86400e6 − 1` µs) so "the value at the
  * close of each day" reads naturally and ties at midnight stay inside
  * the day.
  */
object ResampleQuery {

  val resample = Q(
    "q_resample_ffill",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          tsMicros.as("tus"))
        .filter(col("user_id").isNotNull && col("tus").isNotNull)
      // one observation per (user, instant): highest event_id wins.
      // Shape: an explicit user_id exchange + LWW aggregate instead of a
      // (user_id, tus)-partitioned row_number window — clustering by a
      // subset of the grouping keys satisfies the aggregate's
      // distribution, the winner rule (max event_id; event_id is unique,
      // so the struct max never compares `value`) is identical, partial
      // map-side aggregation pre-reduces the shuffle, and the output
      // stays hash(user_id)-partitioned, which is exactly the
      // distribution the as-of join requires of its right side — the
      // window shape paid a second exchange there.
      val obs = ev.repartition(col("user_id"))
        .groupBy("user_id", "tus")
        .agg(max(struct(col("event_id"), col("value"))).as("w"))
        .select(col("user_id"), col("tus"), col("w.value").as("value"))
      // FLOOR division, not `div` (truncate-toward-zero): the DuckDB
      // oracle's `//` floors, and the two diverge on negative (pre-1970)
      // microsecond timestamps. `tus - pmod(tus, d)` is an exact multiple
      // of d, so the trailing `div` is exact for every long.
      val days = ev.agg(
          expr("(min(tus) - pmod(min(tus), 86400000000)) div 86400000000")
            .as("lo"),
          expr("(max(tus) - pmod(max(tus), 86400000000)) div 86400000000")
            .as("hi"))
        .select(explode(expr("sequence(lo, hi)")).as("day"))
      val spine = ev.select(col("user_id")).distinct()
        .crossJoin(days)
        .withColumn("tus",
          (col("day") + 1) * lit(86400000000L) - lit(1L))
      graft.plans.AsOfJoinNative.asOf(spine, obs,
          key = "user_id", ts = "tus", rightCols = Seq("value"))
        .select(col("user_id"), col("day"),
          round(col("asof_value"), 6).as("val"))
        .orderBy("user_id", "day")
    },
    Some("""WITH ev AS (
              SELECT event_id, user_id, value, epoch_us(ts) AS tus
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            obs AS (
              SELECT user_id, tus, value FROM (
                SELECT user_id, tus, value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, tus
                                          ORDER BY event_id DESC) AS rn
                FROM ev) WHERE rn = 1),
            b AS (SELECT MIN(tus) // 86400000000 AS lo,
                         MAX(tus) // 86400000000 AS hi FROM ev),
            days AS (SELECT UNNEST(GENERATE_SERIES(
                       (SELECT lo FROM b), (SELECT hi FROM b))) AS day),
            spine AS (
              SELECT u.user_id, d.day,
                     (d.day + 1) * 86400000000 - 1 AS tus
              FROM (SELECT DISTINCT user_id FROM ev) u, days d)
            SELECT s.user_id, s.day, ROUND(o.value, 6) AS val
            FROM spine s ASOF LEFT JOIN obs o
              ON s.user_id = o.user_id AND o.tus <= s.tus
            ORDER BY s.user_id, s.day"""),
    bench = true)

  val all: Seq[Q] = Seq(resample)
}
