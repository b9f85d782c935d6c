package graft.ingest

import java.nio.file.Files

import graft.SparkSpec
import graft.core.{EventType, FixedClock}
import graft.sink.{BufferedSink, ParquetDirSink}

/** Mirrors tests/test_raw_capture.py: every positional arg and extra
  * kwarg lands verbatim inside payload.raw.
  */
class RawCaptureSpec extends SparkSpec {

  test("raw captures serialized, prompts, and arbitrary extra kwargs") {
    val dir = Files.createTempDirectory("raw").toString
    val logger = new ParquetLogger(
      new BufferedSink(new ParquetDirSink(spark, dir).write, 1),
      EventType.Default, Map.empty, FixedClock(1700000000000000L))
    logger.onLlmStart(
      Map("kwargs" -> Map("model_name" -> "m")),
      Seq("p1", "p2"), "r1",
      extra = Map(
        "invocation_params" -> Map("temperature" -> 0.5),
        "unexpected_future_arg" -> Seq(1, 2, 3),
        "another" -> "thing"))
    val payload = spark.read.parquet(dir).head().getAs[String]("payload")
    assert(payload.contains(""""raw":{"""))
    assert(payload.contains(""""prompts":["p1","p2"]"""))
    assert(payload.contains(""""unexpected_future_arg":[1,2,3]"""))
    assert(payload.contains(""""another":"thing""""))
    assert(payload.contains(""""invocation_params":{"temperature":0.5}"""))
  }

  test("raw captures the full response on llm_end " +
    "(test_raw_capture.py:69-109)") {
    val dir = Files.createTempDirectory("raw2").toString
    val logger = new ParquetLogger(
      new BufferedSink(new ParquetDirSink(spark, dir).write, 1),
      EventType.Default, Map.empty, FixedClock(1700000000000000L))
    logger.onLlmEnd(Map(
      "generations" -> Seq(Seq(Map("text" -> "out"))),
      "llm_output" -> Map("token_usage" -> Map("total_tokens" -> 4))),
      "r1", extra = Map("run_extra" -> true))
    val payload = spark.read.parquet(dir).head().getAs[String]("payload")
    assert(payload.contains(""""response":{"generations""""))
    assert(payload.contains(""""run_extra":true"""))
  }
}
