package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** One callback event, normalized into the fixed 7-column envelope.
  *
  * Mirrors the reference's declared PyArrow schema
  * (langchain_callback_parquet_logger/logger.py:21-30): all columns are
  * non-null; absent `parent_run_id`/`custom_id` are empty strings, never
  * null (logger.py:170-171).
  */
final case class LogEntry(
    timestamp: Timestamp,
    run_id: String,
    parent_run_id: String,
    custom_id: String,
    event_type: String,
    logger_metadata: String,
    payload: String)

object LogSchema {

  /** Envelope schema, declared up-front so nothing is ever inferred. */
  val schema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("run_id", StringType, nullable = false),
    StructField("parent_run_id", StringType, nullable = false),
    StructField("custom_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("logger_metadata", StringType, nullable = false),
    StructField("payload", StringType, nullable = false)
  ))

  /** Typed prefix of the payload JSON (logger.py:168-187, README.md:355-383)
    * for `from_json` on the read side. `data` carries the per-event fields we
    * query; unknown fields are simply absent (null) after parsing. `raw` is
    * open-world and intentionally left out of the typed view — use
    * `get_json_object` for ad-hoc access.
    */
  val payloadSchema: StructType = StructType(Seq(
    StructField("event_type", StringType),
    StructField("timestamp", StringType),
    StructField("execution", StructType(Seq(
      StructField("run_id", StringType),
      StructField("parent_run_id", StringType),
      StructField("custom_id", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("metadata", MapType(StringType, StringType))
    ))),
    StructField("data", StructType(Seq(
      StructField("prompts", ArrayType(StringType)),
      StructField("model", StringType),
      StructField("llm_type", StringType),
      StructField("input_str", StringType),
      StructField("output", StringType),
      StructField("usage", MapType(StringType, LongType)),
      StructField("usage_metadata", StructType(Seq(
        StructField("input_tokens", LongType),
        StructField("output_tokens", LongType),
        StructField("total_tokens", LongType)
      ))),
      StructField("error", StructType(Seq(
        StructField("message", StringType),
        StructField("type", StringType)
      )))
    )))
  ))
}

/** Event-type vocabulary (reference config.py:8-32 plus the three synthetic
  * background-retrieval types, background_retrieval.py:153/201/257).
  */
object EventType {
  val LlmStart = "llm_start"
  val LlmEnd = "llm_end"
  val LlmError = "llm_error"
  val ChatModelStart = "chat_model_start"
  val ChainStart = "chain_start"
  val ChainEnd = "chain_end"
  val ChainError = "chain_error"
  val ToolStart = "tool_start"
  val ToolEnd = "tool_end"
  val ToolError = "tool_error"
  val AgentAction = "agent_action"
  val AgentFinish = "agent_finish"
  val BackgroundRetrievalAttempt = "background_retrieval_attempt"
  val BackgroundRetrievalComplete = "background_retrieval_complete"
  val BackgroundRetrievalError = "background_retrieval_error"

  val All: Set[String] = Set(
    LlmStart, LlmEnd, LlmError, ChatModelStart,
    ChainStart, ChainEnd, ChainError,
    ToolStart, ToolEnd, ToolError,
    AgentAction, AgentFinish)

  /** Default logged subset (config.py:23-27). */
  val Default: Set[String] = Set(LlmStart, LlmEnd, LlmError, ChatModelStart)
}
