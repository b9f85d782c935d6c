package graft.batch

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._

/** B9's `with_structured_output` analog: LLM responses arrive as JSON
  * strings; the declared schema comes from a case class `Encoder`, and
  * parsing is columnar `from_json` — schema-checked, codegen'd, and
  * null-preserving (absent/None fields stay null, mirroring the
  * reference's Pydantic field semantics,
  * tests/test_pydantic_serialization.py:311-341).
  */
object StructuredOutput {

  /** Parse a column of JSON strings into typed rows. In permissive mode
    * (default) unparseable rows are dropped — error-as-value at the row
    * level, consistent with B3; fields that may be absent in otherwise
    * valid JSON must be `Option[_]` in the model (None stays null).
    * `strict=true` fails the job on the first malformed row instead.
    */
  def parse[T: Encoder](json: Dataset[String], strict: Boolean = false): Dataset[T] = {
    val enc = implicitly[Encoder[T]]
    val schema = enc.schema
    val mode = if (strict) "FAILFAST" else "PERMISSIVE"
    json.select(from_json(col("value"), schema,
      Map("mode" -> mode)).as("p"))
      // permissive from_json renders a malformed row as an all-null
      // struct (not a null struct) — drop those
      .filter(col("p").isNotNull && to_json(col("p")) =!= lit("{}"))
      .select("p.*")
      .as[T]
  }

  /** Columnar variant for a result column inside a wider DataFrame. */
  def parseColumn(df: org.apache.spark.sql.DataFrame, column: String,
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    df.withColumn(column + "_parsed", from_json(col(column), schema))
}
