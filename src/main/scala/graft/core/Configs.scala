package graft.core

/** Configuration surface, one case class per reference dataclass
  * (config.py:35-157). These are the engine's "DDL".
  */
final case class S3Config(
    bucket: String,
    prefix: String = "",
    retryAttempts: Int = 3,
    onFailure: String = "error" // "error" | "continue"
) {
  /** Prefix normalization (config.py:43-46): strip slashes, ensure single
    * trailing slash when non-empty. */
  def normalizedPrefix: String = {
    val p = prefix.stripPrefix("/").stripSuffix("/")
    if (p.isEmpty) "" else p + "/"
  }
}

final case class JobConfig(
    category: String = "default",
    subcategory: String = "general",
    version: String = "1.0.0") {
  /** `.` → `_` sanitization for path use (batch.py:199-201). */
  def versionSafe: String = version.replace(".", "_")
}

final case class ProcessingConfig(
    maxConcurrency: Int = 100,
    bufferSize: Int = 1000,
    returnResults: Boolean = false,
    returnExceptions: Boolean = true)

final case class StorageConfig(
    logDir: String = "llm_logs",
    pathTemplate: String = "{job_category}/{job_subcategory}/v{job_version_safe}",
    partitionOn: Option[String] = Some("date"),
    s3: Option[S3Config] = None)

final case class ColumnConfig(
    promptColumn: String = "prompt",
    configColumn: String = "config",
    toolsColumn: String = "tools")

/** Clock indirection: the reference stamps rows/paths from wall clock
  * (logger.py:231, :467); tests and oracle runs need determinism.
  */
trait Clock extends Serializable { def nowMicros: Long }
object SystemClock extends Clock {
  def nowMicros: Long = System.currentTimeMillis() * 1000L
}
final case class FixedClock(var micros: Long) extends Clock {
  def nowMicros: Long = micros
  def advance(us: Long): Unit = micros += us
}
