package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The README "Usage" snippets, verbatim, as compiled code — so the
  * documentation cannot drift from the real API. Never executed; the
  * compiler is the test.
  */
object ReadmeSnippets {

  def loggingSnippet(spark: SparkSession): Unit = {
    import graft.ingest.{ParquetLogger, Tagging}
    import graft.sink.{BufferedSink, ParquetDirSink}

    val parquet = new ParquetDirSink(spark, "/data/llm_logs")
    val sink = new BufferedSink(parquet.write, bufferSize = 100)
    val logger = new ParquetLogger(sink,
      loggerMetadata = Map("env" -> "prod", "pipeline" -> "chat"))
    val tags = Tagging.withTags(customId = "req-42")("tags")
    logger.onLlmStart(Map("_type" -> "openai"), Seq("What is Spark?"),
      runId = "run-1", tags = tags)
    logger.onLlmEnd(Map("token_usage" -> Map("total_tokens" -> 512)),
      runId = "run-1")
    logger.close() // flushes the buffer
  }

  def batchSnippet(
      spark: SparkSession,
      promptsDf: DataFrame,
      callYourApi: (String, Map[String, Any]) => String): Unit = {
    import graft.batch.{BatchProcess, LlmConfig}
    import graft.core.{JobConfig, ProcessingConfig, StorageConfig}

    val out = BatchProcess.run(spark, promptsDf,
      llm = LlmConfig(model = "some-model",
        llmKwargs = Map("temperature" -> 0.2)),
      transport = (prompt, kwargs) => callYourApi(prompt, kwargs),
      job = JobConfig(category = "distill", version = "3.0.0"),
      processing = ProcessingConfig(maxConcurrency = 8),
      storage = StorageConfig(logDir = "/data/llm_logs"))
    println(s"processed ${out.processed} rows, events at ${out.logDir}")
  }

  def querySnippet(spark: SparkSession): Unit = {
    import graft.query.LogTable

    val logs = LogTable.read(spark, "/data/llm_logs")
    logs.tokenUsageByCustomId.show() // per-custom-id token accounting

    // every packaged query also runs standalone:
    graft.queries.Registry.all.find(_.name == "q_dedup_minhash").get
      .spark(spark, "/data/corpus").show()
  }

  def liveSnippet(spark: SparkSession): Unit = {
    import graft.streaming.{IdempotentSink, LogStream}

    val live = LogStream.tokenUsage(LogStream.read(spark, "/data/llm_logs"))
    live.writeStream.outputMode("update").format("console").start()

    // micro-batches land exactly-once; compaction swaps them atomically
    IdempotentSink.compactCommitted(spark, "/data/llm_sink")
    IdempotentSink.cleanupSuperseded(spark, "/data/llm_sink") // after grace
  }
}
