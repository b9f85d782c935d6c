package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ExtractCustomId

/** Read-side query surface over the `events` table — the driver-testdata
  * analog of the reference's log table (event_type + JSON props +
  * timestamps). Each query maps to an operator in SURVEY.md §2.4/§2.6.
  *
  * Scale notes: every query here is a single scan + (optional) hash
  * aggregate / window over a partitionable key (`user_id`, `event_type`);
  * no driver-side collection; filters and projections push to parquet.
  */
object EventQueries {

  /** Q1: scan + pushed-down filter on event_type. */
  val scanFilter = Q(
    "q_scan_filter",
    (s, dir) => tbl(s, dir, "events")
      .filter(col("event_type") === "click")
      .select("event_id", "user_id", "event_type", "value", "props")
      .orderBy("event_id"),
    Some("""SELECT event_id, user_id, event_type, value, props
            FROM events WHERE event_type = 'click' ORDER BY event_id"""))

  /** Q2/Q3: JSON payload projection with null-safe scalar extraction. */
  val jsonExtract = Q(
    "q_json_extract",
    (s, dir) => tbl(s, dir, "events")
      .select(
        col("event_id"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L))
          .as("k_value"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
                   COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_value
            FROM events ORDER BY event_id"""))

  /** The same scalar extraction through Spark 4's VARIANT type:
    * `parse_json` once into the binary variant encoding, then typed
    * `variant_get` paths — the schemaless-payload path that replaces
    * repeated string re-parsing when many fields are extracted from one
    * JSON column (parse once, navigate many times). Results are typed
    * scalars, so the oracle is ordinary JSON SQL.
    */
  val variantExtract = Q(
    "q_variant_extract",
    (s, dir) => tbl(s, dir, "events")
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(
        col("event_id"),
        coalesce(expr("variant_get(v, '$.k', 'long')"), lit(0L)).as("k_value"),
        expr("variant_get(v, '$.k', 'string')").as("k_str"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
                   COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0) AS k_value,
                   json_extract_string(props, '$.k') AS k_str
            FROM events ORDER BY event_id"""))

  /** Flagship (§7.2): token-usage-style aggregation — parse JSON, sum the
    * extracted scalar per logical custom id. Maps to README.md:221-224 /
    * examples/batch_run_example.py:100-130 composed.
    */
  val jsonAggTokens = Q(
    "q_json_agg_tokens",
    (s, dir) => tbl(s, dir, "events")
      .select(
        col("user_id"),
        coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(0L))
          .as("k"))
      .groupBy("user_id")
      .agg(sum("k").cast("long").as("total_k"), cnt("n_events"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
                   CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS total_k,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id ORDER BY user_id"""),
    bench = true)

  /** Q7: group-filtered counts per event type. */
  val eventCounts = Q(
    "q_event_counts",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("event_type").agg(cnt())
      .orderBy("event_type"),
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"""))

  /** Q6: distinct membership. */
  val distinctTypes = Q(
    "q_distinct_types",
    (s, dir) => tbl(s, dir, "events")
      .select("event_type").distinct().orderBy("event_type"),
    Some("SELECT DISTINCT event_type FROM events ORDER BY event_type NULLS FIRST"))

  /** A8: checkpoint compaction — dedup keep-last per key with an explicit
    * order (the reference's pandas keep-last relies on implicit row order;
    * here the order is ts desc, event_id desc, made microsecond-stable).
    */
  val dedupKeepLast = Q(
    "q_dedup_keeplast",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tus").desc, col("event_id").desc)
      tbl(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), tsMicros.as("tus"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id, event_type, value FROM (
              SELECT user_id, event_id, event_type, value,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
              FROM events) WHERE rn = 1 ORDER BY user_id"""))

  /** A1: checkpoint resume — left-anti join of the input against the set of
    * already-processed ids (derived checkpoint: event_id % 3 = 0).
    */
  val antiJoinCheckpoint = Q(
    "q_anti_join_checkpoint",
    (s, dir) => {
      val events = tbl(s, dir, "events")
      val checkpoint = events.filter(col("event_id") % 3 === 0)
        .select(col("event_id").as("processed_id"))
      events.join(checkpoint, col("event_id") === col("processed_id"), "left_anti")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, event_type FROM events e
            WHERE NOT EXISTS (
              SELECT 1 FROM events c
              WHERE c.event_id % 3 = 0 AND c.event_id = e.event_id)
            ORDER BY event_id"""))

  /** T2: custom-id extraction from a tags array via the native Catalyst
    * expression `ExtractCustomId` (stays in whole-stage codegen).
    */
  val customIdExtract = Q(
    "q_custom_id_extract",
    (s, dir) => tbl(s, dir, "events")
      .select(
        col("event_id"),
        array(
          lit("env:prod"),
          concat(lit(ExtractCustomId.Prefix), col("user_id").cast("string")),
          lit("other:tag")).as("tags"))
      .select(col("event_id"), ExtractCustomId(col("tags")).as("custom_id"))
      .orderBy("event_id"),
    Some("""SELECT event_id, CAST(user_id AS VARCHAR) AS custom_id
            FROM events ORDER BY event_id"""))

  /** Q9: union over partition-like splits of the log. */
  val unionPartitions = Q(
    "q_union_partitions",
    (s, dir) => {
      val events = tbl(s, dir, "events")
      // 2024-01-15T00:00:00Z as ns-epoch (ts column is a ns-epoch long)
      val cutoff = lit(1705276800000000000L)
      val early = events.filter(col("ts") < cutoff)
        .select(col("event_id"), col("event_type"), lit("early").as("part"))
      val late = events.filter(col("ts") >= cutoff)
        .select(col("event_id"), col("event_type"), lit("late").as("part"))
      early.unionByName(late).orderBy("event_id")
    },
    Some("""SELECT event_id, event_type, 'early' AS part FROM events
            WHERE ts < TIMESTAMP '2024-01-15'
            UNION ALL
            SELECT event_id, event_type, 'late' AS part FROM events
            WHERE ts >= TIMESTAMP '2024-01-15'
            ORDER BY event_id"""))

  /** Event-time tumbling-window aggregation (streaming-shaped; the
    * Structured Streaming twin lives in graft.streaming and is covered by
    * ScalaTest — batch and stream share this plan).
    */
  val windowAgg = Q(
    "q_window_agg",
    (s, dir) => tbl(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", timestamp_micros(tsMicros)),
          "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(cnt(),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))), 2)
          .cast("double").as("sum_value"))
      .orderBy("hour", "event_type"),
    Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   ${sqlSumRound("CAST(value AS DECIMAL(18,6))")} AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2 NULLS FIRST"""),
    bench = true)

  /** Gap-based sessionization (30-min inactivity gap): lag + cumulative sum
    * windows, fully shuffle-partitioned by user_id.
    */
  val sessionize = Q(
    "q_sessionize",
    (s, dir) => {
      val gapUs = 30L * 60 * 1000000
      val wOrd = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "events")
        .select(col("user_id"), col("event_id"), tsMicros.as("tus"))
        .withColumn("prev", lag("tus", 1).over(wOrd))
        .withColumn("brk",
          when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1
          ).otherwise(0))
        .withColumn("session_no", sum("brk").over(wRun).cast("long"))
        .groupBy("user_id", "session_no")
        .agg(cnt("n_events"),
          min("tus").as("session_start_us"), max("tus").as("session_end_us"))
        .orderBy("user_id", "session_no")
    },
    Some("""WITH x AS (
              SELECT user_id, event_id, epoch_us(ts) AS tus FROM events),
            y AS (
              SELECT user_id, event_id, tus,
                     lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev
              FROM x),
            z AS (
              SELECT user_id, tus,
                     CAST(SUM(CASE WHEN prev IS NULL OR tus - prev > 1800000000
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY tus, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
              FROM y)
            SELECT user_id, session_no, CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(tus) AS session_start_us, MAX(tus) AS session_end_us
            FROM z GROUP BY user_id, session_no ORDER BY user_id, session_no"""),
    bench = true)

  /** Window navigation: per-user previous/next event and inter-event gap
    * (lag/lead), plus percent_rank of the event value within the user —
    * the remaining window-function family (navigation + relative rank)
    * next to ntile/row_number/cumulative-sum elsewhere. One partitioning,
    * two orderings; the user-hash shuffle is shared, each ordering adds
    * only a partition-local sort.
    */
  val windowNav = Q(
    "q_window_nav",
    (s, dir) => {
      val wSeq = Window.partitionBy("user_id").orderBy("tus", "event_id")
      val wVal = Window.partitionBy("user_id").orderBy("value", "event_id")
      tbl(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), tsMicros.as("tus"))
        .select(col("event_id"), col("user_id"),
          coalesce(lag("event_type", 1).over(wSeq), lit("")).as("prev_type"),
          coalesce(lead("event_type", 1).over(wSeq), lit("")).as("next_type"),
          coalesce(col("tus") - lag("tus", 1).over(wSeq), lit(-1L)).as("gap_us"),
          round(percent_rank().over(wVal), 6).as("pr"))
        .orderBy("event_id")
    },
    Some("""SELECT event_id, user_id,
                   COALESCE(LAG(event_type) OVER w1, '') AS prev_type,
                   COALESCE(LEAD(event_type) OVER w1, '') AS next_type,
                   COALESCE(tus - LAG(tus) OVER w1, -1) AS gap_us,
                   -- NULLS FIRST pins Spark's ASC default (DuckDB
                   -- defaults NULLS LAST — divergence surfaced by the
                   -- null-injection gate)
                   ROUND(PERCENT_RANK() OVER
                     (PARTITION BY user_id
                      ORDER BY value NULLS FIRST, event_id), 6) AS pr
            FROM (SELECT event_id, user_id, event_type, value,
                         epoch_us(ts) AS tus FROM events)
            WINDOW w1 AS (PARTITION BY user_id ORDER BY tus, event_id)
            ORDER BY event_id"""))

  /** Gap sessionization via Spark's BUILT-IN `session_window` — the
    * declarative twin of q_sessionize's lag+cumsum formulation. Spark
    * merges windows that overlap, i.e. a session breaks when the gap is
    * ≥ the window size, so the oracle's break predicate uses `>=` (the
    * manual variant uses `>`; both are valid gap conventions, pinned
    * explicitly on both sides). At scale this is one shuffle on user_id
    * + a per-partition merge — state handled by the operator itself,
    * streaming-ready with a watermark.
    */
  val sessionWindow = Q(
    "q_session_window",
    (s, dir) => tbl(s, dir, "events")
      .select(col("user_id"), timestamp_micros(tsMicros).as("ts"))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(cnt("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us"),
    Some("""WITH x AS (
              SELECT user_id, epoch_us(ts) AS tus FROM events),
            y AS (
              SELECT user_id, tus,
                     lag(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
              FROM x),
            z AS (
              SELECT user_id, tus,
                     CAST(SUM(CASE WHEN prev IS NULL OR tus - prev >= 1800000000
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY tus
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
              FROM y),
            g AS (
              SELECT user_id, session_no, MIN(tus) AS session_start_us,
                     MAX(tus) + 1800000000 AS session_end_us,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM z GROUP BY user_id, session_no)
            SELECT user_id, session_start_us, session_end_us, n_events
            FROM g ORDER BY user_id, session_start_us"""),
    bench = true)

  /** Schemaless JSON as a first-class MAP: parse into map<string,string>
    * and explode the entries — the MapType leg of the dynamic-payload
    * surface (next to the string-path, struct, and VARIANT legs). At
    * scale this is a row-local generate (no shuffle) and the map parse
    * happens once per row regardless of key count.
    */
  val mapEntries = Q(
    "q_map_entries",
    (s, dir) => tbl(s, dir, "events")
      .select(col("event_id"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
          .as(Seq("key", "value")))
      .orderBy("event_id", "key"),
    Some("""SELECT event_id, k AS key,
                   json_extract_string(props, '$.' || k) AS value
            FROM (SELECT event_id, props, unnest(json_keys(props)) AS k
                  FROM events)
            ORDER BY event_id, key"""))

  val all: Seq[Q] = Seq(
    scanFilter, jsonExtract, jsonAggTokens, eventCounts, distinctTypes,
    dedupKeepLast, antiJoinCheckpoint, customIdExtract, unionPartitions,
    windowAgg, sessionize, windowNav, sessionWindow, variantExtract,
    mapEntries)
}
