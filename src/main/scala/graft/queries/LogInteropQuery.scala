package graft.queries

import org.apache.spark.sql.functions._

/** Write-side drop-in compatibility proof, oracle-checked — the converse of
  * `ReferenceInteropSpec` (which reads reference-written files through
  * graft): here GRAFT writes a log directory through its own sink path, and
  * DuckDB plays the reference's pandas reader (reference README.md:218,
  * `pd.read_parquet(...)` over the log dir; payload navigation as in
  * examples/batch_run_example.py:100-130).
  *
  * The Spark side answers an aggregate from the SOURCE `events` table only;
  * the oracle answers the same aggregate from the graft-WRITTEN files via
  * `read_parquet(..., hive_partitioning=1)`. A hash-match therefore proves
  * that a reference user's reader consumes graft-written logs unchanged:
  *   - all 7 envelope columns are present and typed (the oracle references
  *     every one of them — a missing/renamed column fails the SQL),
  *   - `timestamp` survives as a µs-precision UTC instant (`epoch_us`
  *     equality against the source epoch),
  *   - the `date=` Hive partition layout parses (partition column used),
  *   - `payload` is JSON navigable by `json_extract_string`.
  */
object LogInteropQuery {

  /** The oracle SQL is static text, so the written dir must be a fixed
    * path AT ORACLE-DUMP TIME. The query rebuilds it from scratch on every
    * run (delete + write), so its content always reflects the current
    * sfDir. `graft.Verify` sets the `graft.interop.dir` system property to
    * an sfDir-tagged path BEFORE this object initializes, so sweeps at
    * different scale factors own different directories and a later sweep
    * can no longer invalidate an earlier sweep's oracle compare (the
    * failure a fixed shared path produced when sweeping sf0.001/0.01/0.1
    * back-to-back). Within one JVM the path is stable — the oracle string
    * and the writer always agree.
    */
  val logDir: String =
    sys.props.getOrElse("graft.interop.dir", "/tmp/graft_interop_log")

  val interop = Q(
    "q_log_interop",
    (s, dir) => {
      graft.core.Fs.delete(s, logDir)
      val events = tbl(s, dir, "events")
      // ingest projection: the 7-column envelope (columnar bulk analog of
      // graft.ingest.ParquetLogger — same ParquetDirSink underneath, same
      // layout; LoggerSinkSpec pins row-at-a-time and bulk to one schema)
      val entries = events.select(
        timestamp_micros(tsMicros).as("timestamp"),
        concat(lit("run-"), col("event_id")).as("run_id"),
        lit("").as("parent_run_id"),
        col("user_id").cast("string").as("custom_id"),
        col("event_type").as("event_type"),
        lit("""{"job":"interop"}""").as("logger_metadata"),
        to_json(struct(
          col("event_type"),
          struct(get_json_object(col("props"), "$.k").cast("long").as("k"),
            col("value").as("value")).as("data"))).as("payload"))
      new graft.sink.ParquetDirSink(s, logDir).writeDataset(entries)
      // Spark's answer: from the source table, independent of the files.
      events.groupBy(col("event_type"))
        .agg(
          cnt("n_events"),
          countDistinct(col("event_id")).as("n_runs"),
          max(tsMicros).as("max_us"),
          min(tsMicros).as("min_us"),
          sum(coalesce(get_json_object(col("props"), "$.k").cast("long"),
            lit(0L))).cast("long").as("total_k"),
          countDistinct(to_date(timestamp_micros(tsMicros))).as("n_dates"),
          max(col("user_id").cast("string")).as("max_custom_id"))
        .orderBy("event_type")
    },
    Some(s"""SELECT event_type,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(DISTINCT run_id) AS BIGINT) AS n_runs,
          MAX(epoch_us(timestamp)) AS max_us,
          MIN(epoch_us(timestamp)) AS min_us,
          CAST(SUM(COALESCE(CAST(json_extract_string(payload, '$$.data.k') AS BIGINT), 0)) AS BIGINT) AS total_k,
          CAST(COUNT(DISTINCT date) AS BIGINT) AS n_dates,
          MAX(custom_id) AS max_custom_id
        FROM read_parquet('$logDir/date=*/*.parquet', hive_partitioning=1)
        WHERE parent_run_id = ''
          AND json_extract_string(logger_metadata, '$$.job') = 'interop'
        GROUP BY event_type ORDER BY event_type NULLS FIRST"""))
}
