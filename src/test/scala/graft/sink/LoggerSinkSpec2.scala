package graft.sink

import java.nio.file.Files
import java.util.concurrent.Executors

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.{EventType, FixedClock}
import graft.ingest.ParquetLogger

class LoggerSinkSpec2 extends SparkSpec {

  test("chat_model_start and agent events carry their payload shapes " +
    "(test_enhanced_logging.py:213-320, E11/E12)") {
    val dir = Files.createTempDirectory("log2").toString
    val logger = new ParquetLogger(
      new BufferedSink(new ParquetDirSink(spark, dir).write, 1),
      EventType.All, Map.empty, FixedClock(1700000000000000L))
    logger.onChatModelStart(
      Map("_type" -> "chat-openai", "kwargs" -> Map("model_name" -> "c-1")),
      messages = Seq(Map("role" -> "user", "content" -> "hi")), "r1")
    logger.onAgentAction("search", Map("q" -> "spark"), "thought: look", "r2")
    logger.onAgentFinish(Map("output" -> "done"), "final", "r3")

    val byRun = spark.read.parquet(dir).collect()
      .map(r => r.getAs[String]("run_id") ->
        (r.getAs[String]("event_type"), r.getAs[String]("payload"))).toMap
    assert(byRun("r1")._1 === "chat_model_start")
    assert(byRun("r1")._2.contains(""""llm_type":"chat-openai""""))
    assert(byRun("r1")._2.contains(""""model":"c-1""""))
    assert(byRun("r2")._1 === "agent_action")
    assert(byRun("r2")._2.contains(
      """"action":{"tool":"search","tool_input":{"q":"spark"},"log":"thought: look"}"""))
    assert(byRun("r3")._2.contains(
      """"finish":{"return_values":{"output":"done"},"log":"final"}"""))
  }

  test("BufferedSink under concurrent appends loses nothing") {
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val batches = new java.util.concurrent.atomic.AtomicLong(0)
    val sink = new BufferedSink(entries => {
      written.addAndGet(entries.size)
      batches.incrementAndGet()
    }, bufferSize = 7)
    val pool = Executors.newFixedThreadPool(8)
    val n = 2000
    (1 to n).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = sink.append(graft.core.LogEntry(
          new java.sql.Timestamp(0), s"r$i", "", "", "llm_end", "{}", "{}"))
      })
    }
    pool.shutdown()
    pool.awaitTermination(30, java.util.concurrent.TimeUnit.SECONDS)
    sink.close()
    assert(written.get() === n.toLong)
    assert(batches.get() >= (n / 7).toLong)
  }
}
