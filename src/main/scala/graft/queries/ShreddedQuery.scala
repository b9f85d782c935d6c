package graft.queries

import org.apache.spark.sql.functions._

/** Oracle proof for [[graft.query.ShreddedLog]]: shredded-store reads ≡
  * parse-on-read of the same log files, cross-engine.
  *
  * The fixture is a REAL sink-written log (production `ParquetDirSink`,
  * hive `date=` layout) whose payloads carry the typed §1.3 prefix —
  * model, llm_type, usage_metadata token counts, error struct on a slice
  * of rows. The Spark side answers ONLY from the shredded store (typed
  * columns; the store's build parsed each payload exactly once); the
  * DuckDB oracle answers by `json_extract_string`-parsing the ORIGINAL
  * log files per row — the parse-on-read semantics the store replaces. A
  * hash match proves the shred lost nothing: values, nulls (absent error
  * structs), and grouping all survive the projection.
  *
  * Log write + store build are memoized per (process, sf), like
  * [[RunTreeQuery]]: the bench/verify cost is the shredded READ, not
  * repeated fixture I/O.
  */
object ShreddedQuery {

  private val baseDir: String =
    sys.props.getOrElse("graft.shred.dir", "/tmp/graft_shred_log")
  val logDir: String = baseDir + "_log"
  val storeDir: String = baseDir + "_store"

  private val builtFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write the log through the production sink and maintain the shredded
    * store, once per (process, sf).
    */
  private def ensureBuilt(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    builtFor.compute(logDir, (_, prev) => {
      if (prev != dir) {
        graft.core.Fs.delete(s, logDir)
        val ev = tbl(s, dir, "events")
          .withColumn("eid", col("event_id").cast("long"))
          .withColumn("in_tok",
            coalesce(get_json_object(col("props"), "$.k").cast("long"),
              lit(0L)))
          .withColumn("out_tok", pmod(col("eid"), lit(100L)))
          // half the rows are llm_end so the token-usage builders (which
          // filter on it, reference README.md:221-224) see real traffic
          .withColumn("event_type",
            when(pmod(col("eid"), lit(2L)) === 0, lit("llm_end"))
              .otherwise(col("event_type")))
        val entries = ev.select(
          timestamp_micros(tsMicros).as("timestamp"),
          concat(lit("run-"), col("eid")).as("run_id"),
          lit("").as("parent_run_id"),
          col("user_id").cast("string").as("custom_id"),
          col("event_type"),
          lit("""{"job":"shred"}""").as("logger_metadata"),
          to_json(struct(
            col("event_type"),
            struct(
              concat(lit("m"), pmod(col("eid"), lit(3L))).as("model"),
              lit("chat").as("llm_type"),
              struct(
                col("in_tok").as("input_tokens"),
                col("out_tok").as("output_tokens"),
                (col("in_tok") + col("out_tok")).as("total_tokens"))
                .as("usage_metadata"),
              when(pmod(col("eid"), lit(11L)) === 0,
                struct(concat(lit("boom-"), col("eid")).as("message"),
                  lit("Timeout").as("type")))
                .as("error")).as("data"))).as("payload"))
        new graft.sink.ParquetDirSink(s, logDir).writeDataset(entries)
        graft.query.ShreddedLog.build(s, logDir, storeDir)
      }
      dir
    })
    ()
  }

  /** Token/error rollup per model, answered from TYPED columns only. */
  val shredded = Q(
    "q_log_shredded",
    (s, dir) => {
      ensureBuilt(s, dir)
      graft.query.ShreddedLog.read(s, storeDir)
        .groupBy(col("model"))
        .agg(
          cnt("n_events"),
          sum(col("input_tokens")).cast("long").as("in_tokens"),
          sum(col("total_tokens")).cast("long").as("tot_tokens"),
          count(col("error_message")).as("n_errors"),
          max(col("error_type")).as("worst_error"),
          countDistinct(col("custom_id")).as("n_custom"),
          max(unix_micros(col("timestamp"))).as("max_us"))
        .orderBy("model")
    },
    Some(s"""SELECT json_extract_string(payload, '$$.data.model') AS model,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.input_tokens') AS BIGINT)) AS BIGINT)
            AS in_tokens,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.total_tokens') AS BIGINT)) AS BIGINT)
            AS tot_tokens,
          CAST(COUNT(json_extract_string(payload, '$$.data.error.message'))
            AS BIGINT) AS n_errors,
          MAX(json_extract_string(payload, '$$.data.error.type'))
            AS worst_error,
          CAST(COUNT(DISTINCT custom_id) AS BIGINT) AS n_custom,
          MAX(epoch_us(timestamp)) AS max_us
        FROM read_parquet('$logDir/date=*/*.parquet', hive_partitioning=1)
        GROUP BY model ORDER BY model NULLS FIRST"""))

  /** The STANDING token-usage builder routed through the shredded
    * store: [[graft.query.LogTable.tokenUsagePreferShredded]] answers
    * from typed columns when the store exists (it does here — same
    * memoized fixture), from parse-on-read otherwise; either path must
    * equal the oracle's per-row JSON parse of the ORIGINAL log files.
    * The plan's JSON-freeness on the shredded path is asserted in
    * ShreddedLogSpec; this row pins the VALUES cross-engine.
    */
  val tokensShredded = Q(
    "q_tokens_shredded",
    (s, dir) => {
      ensureBuilt(s, dir)
      graft.query.LogTable.tokenUsagePreferShredded(s, logDir, storeDir)
        .select(col("custom_id"),
          col("total_tokens").cast("long").as("total_tokens"),
          col("n_calls"))
        .orderBy("custom_id")
    },
    Some(s"""SELECT custom_id,
          CAST(SUM(COALESCE(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.total_tokens') AS BIGINT), 0))
            AS BIGINT) AS total_tokens,
          CAST(COUNT(*) AS BIGINT) AS n_calls
        FROM read_parquet('$logDir/date=*/*.parquet', hive_partitioning=1)
        WHERE event_type = 'llm_end'
        GROUP BY custom_id ORDER BY custom_id NULLS FIRST"""))

  /** Error drill-down through the same routing
    * ([[graft.query.LogTable.errorsPreferShredded]]): per error type,
    * count, spread over logical ids, and the max message — answered
    * from the shredded store's typed error columns, pinned against the
    * oracle's parse of the raw payloads.
    */
  val errorsShredded = Q(
    "q_errors_shredded",
    (s, dir) => {
      ensureBuilt(s, dir)
      graft.query.LogTable.errorsPreferShredded(s, logDir, storeDir)
    },
    Some(s"""SELECT json_extract_string(payload, '$$.data.error.type')
            AS error_type,
          CAST(COUNT(*) AS BIGINT) AS n_errors,
          CAST(COUNT(DISTINCT custom_id) AS BIGINT) AS n_custom,
          MAX(json_extract_string(payload, '$$.data.error.message'))
            AS worst_message
        FROM read_parquet('$logDir/date=*/*.parquet', hive_partitioning=1)
        WHERE json_extract_string(payload, '$$.data.error.message')
          IS NOT NULL
        GROUP BY error_type ORDER BY error_type NULLS FIRST"""))

  val all: Seq[Q] = Seq(shredded, tokensShredded, errorsShredded)
}
