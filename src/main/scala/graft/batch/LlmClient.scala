package graft.batch

import scala.collection.mutable.ArrayBuffer

import graft.core.LogEntry
import graft.ingest.ParquetLogger
import graft.sink.LogSink

/** The LLM-provider boundary (reference `LLMConfig.create_llm`,
  * config.py:94-157). Real network clients are out of scope (zero egress);
  * the factory pattern + callback plumbing + structured-output wrap are
  * the semantics reproduced and tested.
  */
trait LlmClient extends Serializable {
  def invoke(prompt: String, tags: Seq[String] = Nil): String
}

/** B9: client factory — merges `llmKwargs` ++ `modelKwargs` (model kwargs
  * win, config.py:128-136) and attaches logging callbacks around every
  * call: llm_start before, llm_end after, llm_error on failure.
  */
final case class LlmConfig(
    model: String,
    llmKwargs: Map[String, Any] = Map.empty,
    modelKwargs: Map[String, Any] = Map.empty,
    structuredOutputSchema: Option[String] = None) {

  def mergedKwargs: Map[String, Any] =
    llmKwargs ++ modelKwargs + ("model_name" -> model)

  /** Wrap a raw transport with callback logging (the create_llm analog). */
  def createLlm(
      transport: (String, Map[String, Any]) => String,
      callbacks: Seq[ParquetLogger] = Nil,
      newRunId: () => String =
        () => java.util.UUID.randomUUID().toString): LlmClient =
    new LlmClient {
      private val serialized = Map[String, Any](
        "_type" -> "graft-llm", "kwargs" -> mergedKwargs)
      def invoke(prompt: String, tags: Seq[String]): String = {
        val runId = newRunId()
        callbacks.foreach(_.onLlmStart(serialized, Seq(prompt), runId,
          tags = tags))
        try {
          val out = transport(prompt, mergedKwargs)
          callbacks.foreach(_.onLlmEnd(Map(
            "generations" -> Seq(Seq(Map("text" -> out))),
            "llm_output" -> Map("model_name" -> model)), runId, tags = tags))
          out
        } catch {
          case e: Throwable =>
            callbacks.foreach(_.onLlmError(e, runId, tags = tags))
            throw e
        }
      }
    }
}

/** Executor-side event capture: a [[LogSink]] that just collects entries
  * so they can travel back through the job as data and be written once,
  * columnar, by the driver — the Spark-native replacement for the
  * reference's in-process shared buffer (which cannot span executors).
  */
final class CollectingSink extends LogSink {
  val entries = new ArrayBuffer[LogEntry]()
  override def append(entry: LogEntry): Unit = entries += entry
  override def flush(): Unit = ()
}
