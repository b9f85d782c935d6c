package graft.queries

import org.apache.spark.sql.functions._

/** Oracle proof for [[graft.query.LogRollup]]: aggregates served from
  * incrementally-maintained partial states ≡ a full recompute over the
  * raw log, cross-engine.
  *
  * The fixture is a REAL sink-written log built in TWO GENERATIONS —
  * half the events land, `LogRollup.appendNew` runs, the other half
  * lands, `appendNew` runs again — so the values under test flowed
  * through the incremental path (partials from generation 1 merged with
  * partials from generation 2), never a single-shot rebuild. The DuckDB
  * oracle recomputes the same aggregates by `json_extract_string`-parsing
  * the ORIGINAL log files per row. A hash match proves the partial-state
  * algebra (SUM of counts/sums, MIN/MAX of extrema) loses nothing across
  * maintenance generations. The HLL distinct-custom estimate is
  * approximate BY CONTRACT and is pinned against the exact count in
  * LogRollupSpec, not here.
  *
  * Log write + rollup maintenance are memoized per (process, sf), like
  * [[ShreddedQuery]]: bench/verify repetitions measure the serving READ.
  */
object RollupQuery {

  private val baseDir: String =
    sys.props.getOrElse("graft.rollup.dir", "/tmp/graft_rollup_log")
  val logDir: String = baseDir + "_log"
  val storeDir: String = baseDir + "_store"

  private val builtFor =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Envelope entries derived from the events table, with a `slice`
    * column (eid mod 3) the fixtures split generations/batches on.
    */
  private def entryRows(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val ev = tbl(s, dir, "events")
      .withColumn("eid", col("event_id").cast("long"))
      .withColumn("in_tok",
        coalesce(get_json_object(col("props"), "$.k").cast("long"),
          lit(0L)))
      .withColumn("out_tok", pmod(col("eid") * 13, lit(97L)))
      .withColumn("event_type",
        when(pmod(col("eid"), lit(2L)) === 0, lit("llm_end"))
          .otherwise(col("event_type")))
    ev.select(
      timestamp_micros(tsMicros).as("timestamp"),
      concat(lit("run-"), col("eid")).as("run_id"),
      lit("").as("parent_run_id"),
      col("user_id").cast("string").as("custom_id"),
      col("event_type"),
      lit("""{"job":"rollup"}""").as("logger_metadata"),
      to_json(struct(
        col("event_type"),
        struct(
          concat(lit("m"), pmod(col("eid"), lit(4L))).as("model"),
          lit("chat").as("llm_type"),
          struct(
            col("in_tok").as("input_tokens"),
            col("out_tok").as("output_tokens"),
            (col("in_tok") + col("out_tok")).as("total_tokens"))
            .as("usage_metadata"),
          when(pmod(col("eid"), lit(7L)) === 0,
            struct(concat(lit("err-"), col("eid")).as("message"),
              lit("RateLimit").as("type")))
            .as("error")).as("data"))).as("payload"),
      pmod(col("eid"), lit(3L)).as("slice"))
  }

  /** Two sink generations, one `appendNew` after each. */
  private def ensureBuilt(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    builtFor.compute(logDir, (_, prev) => {
      if (prev != dir) {
        graft.core.Fs.delete(s, logDir)
        graft.core.Fs.delete(s, storeDir)
        val rows = entryRows(s, dir)
        def entries(p: org.apache.spark.sql.Column) =
          rows.filter(p).drop("slice")
        val sink = new graft.sink.ParquetDirSink(s, logDir)
        sink.writeDataset(entries(col("slice") =!= 0))
        graft.query.LogRollup.appendNew(s, logDir, storeDir)
        sink.writeDataset(entries(col("slice") === 0))
        graft.query.LogRollup.appendNew(s, logDir, storeDir)
      }
      dir
    })
    ()
  }

  /** Model-grain dashboard served from the partial store (merged ACROSS
    * both maintenance generations and all dates) vs the oracle's full
    * JSON re-parse of the raw log.
    */
  val tokens = Q(
    "q_rollup_tokens",
    (s, dir) => {
      ensureBuilt(s, dir)
      graft.query.LogRollup.read(s, storeDir, Seq("model"))
        .select(col("model"), col("n_events"), col("n_llm_end"),
          col("in_tokens"), col("tot_tokens"), col("n_errors"),
          col("min_us"), col("max_us"))
        .orderBy("model")
    },
    Some(s"""SELECT json_extract_string(payload, '$$.data.model') AS model,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(*) FILTER (WHERE event_type = 'llm_end') AS BIGINT)
            AS n_llm_end,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.input_tokens') AS BIGINT)) AS BIGINT)
            AS in_tokens,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.total_tokens') AS BIGINT)) AS BIGINT)
            AS tot_tokens,
          CAST(COUNT(json_extract_string(payload, '$$.data.error.message'))
            AS BIGINT) AS n_errors,
          MIN(epoch_us(timestamp)) AS min_us,
          MAX(epoch_us(timestamp)) AS max_us
        FROM read_parquet('$logDir/date=*/*.parquet', hive_partitioning=1)
        GROUP BY model ORDER BY model NULLS FIRST"""))

  /** Daily grain — the store's native (date, model) partials merged per
    * day. Dates are emitted as strings (driver hash compatibility).
    */
  val daily = Q(
    "q_rollup_daily",
    (s, dir) => {
      ensureBuilt(s, dir)
      graft.query.LogRollup.read(s, storeDir)
        .select(date_format(col("date"), "yyyy-MM-dd").as("day"),
          col("model"), col("n_events"), col("tot_tokens"),
          col("n_errors"))
        .orderBy("day", "model")
    },
    Some(s"""SELECT strftime(CAST(timestamp AS DATE), '%Y-%m-%d') AS day,
          json_extract_string(payload, '$$.data.model') AS model,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.total_tokens') AS BIGINT)) AS BIGINT)
            AS tot_tokens,
          CAST(COUNT(json_extract_string(payload, '$$.data.error.message'))
            AS BIGINT) AS n_errors
        FROM read_parquet('$logDir/date=*/*.parquet', hive_partitioning=1)
        GROUP BY day, model
        ORDER BY day NULLS FIRST, model NULLS FIRST"""))

  // ---------------------------------------------------------------------
  // Streaming-tick fixture: the SAME dashboard contract, but the stores
  // are maintained by graft.streaming.LogStreamPipeline.tick — including
  // a crash-before-shred replay and a late replay of a completed tick —
  // so the oracle match proves the batch-keyed idempotence end-to-end
  // on real data, not just in the unit spec.
  // ---------------------------------------------------------------------

  private val streamBase: String =
    sys.props.getOrElse("graft.rollupstream.dir", "/tmp/graft_rollup_stream")
  val streamLogDir: String = streamBase + "_log"
  val streamShredDir: String = streamBase + "_shred"
  val streamStoreDir: String = streamBase + "_store"

  private def ensureBuiltStream(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    builtFor.compute(streamLogDir, (_, prev) => {
      if (prev != dir) {
        graft.core.Fs.delete(s, streamLogDir)
        graft.core.Fs.delete(s, streamShredDir)
        graft.core.Fs.delete(s, streamStoreDir)
        val rows = entryRows(s, dir)
        def batch(k: Int) = rows.filter(col("slice") === k).drop("slice")
        def tick(k: Int): Unit = graft.streaming.LogStreamPipeline.tick(
          batch(k), k.toLong, streamLogDir, streamShredDir, streamStoreDir)
        tick(0)
        // batch 1 crashes after landing; Structured Streaming re-delivers
        graft.streaming.LogStreamPipeline.land(batch(1), 1L, streamLogDir)
        tick(1)
        tick(2)
        tick(0) // at-least-once worst case: late replay of a complete tick
      }
      dir
    })
    ()
  }

  /** Model-grain dashboard served from the STREAM-maintained rollup vs
    * the oracle's full JSON re-parse of the landed log (the extra
    * `batch=` hive level is the replay key, transparent to readers).
    */
  val stream = Q(
    "q_rollup_stream",
    (s, dir) => {
      ensureBuiltStream(s, dir)
      graft.query.LogRollup.read(s, streamStoreDir, Seq("model"))
        .select(col("model"), col("n_events"), col("n_llm_end"),
          col("in_tokens"), col("tot_tokens"), col("n_errors"),
          col("min_us"), col("max_us"))
        .orderBy("model")
    },
    Some(s"""SELECT json_extract_string(payload, '$$.data.model') AS model,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(*) FILTER (WHERE event_type = 'llm_end') AS BIGINT)
            AS n_llm_end,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.input_tokens') AS BIGINT)) AS BIGINT)
            AS in_tokens,
          CAST(SUM(CAST(json_extract_string(payload,
            '$$.data.usage_metadata.total_tokens') AS BIGINT)) AS BIGINT)
            AS tot_tokens,
          CAST(COUNT(json_extract_string(payload, '$$.data.error.message'))
            AS BIGINT) AS n_errors,
          MIN(epoch_us(timestamp)) AS min_us,
          MAX(epoch_us(timestamp)) AS max_us
        FROM read_parquet('$streamLogDir/date=*/batch=*/*.parquet',
                          hive_partitioning=1)
        GROUP BY model ORDER BY model NULLS FIRST"""))

  val all: Seq[Q] = Seq(tokens, daily, stream)
}
