package graft.batch

import graft.SparkSpec

// top level: Spark encoders cannot reach suite-inner classes
case class SimpleModel(answer: String, confidence: Double)
case class NestedModel(name: String, value: Long,
    metadata: Map[String, String])
case class ComplexModel(id: String, count: Long, tags: Seq[String],
    nested: SimpleModel, optional_field: Option[String])

/** Mirrors tests/test_pydantic_serialization.py: simple, nested, and
  * optional-field models parse from JSON responses with None preserved.
  */
class StructuredOutputSpec extends SparkSpec {

  test("simple model parses columnar") {
    import spark.implicits._
    val out = StructuredOutput.parse[SimpleModel](
      Seq("""{"answer":"yes","confidence":0.9}""").toDS()).head()
    assert(out === SimpleModel("yes", 0.9))
  }

  test("nested + optional fields: None stays null " +
    "(test_pydantic_serialization.py:311-341)") {
    import spark.implicits._
    val rows = StructuredOutput.parse[ComplexModel](Seq(
      """{"id":"a","count":2,"tags":["x","y"],
         "nested":{"answer":"n","confidence":0.1},"optional_field":"v"}""",
      """{"id":"b","count":0,"tags":[],
         "nested":{"answer":"m","confidence":0.2}}"""
    ).toDS()).collect().sortBy(_.id)
    assert(rows(0).optional_field === Some("v"))
    assert(rows(0).nested === SimpleModel("n", 0.1))
    assert(rows(1).optional_field === None)
    assert(rows(1).tags === Seq.empty)
  }

  test("malformed rows are dropped, not failures (error-as-value)") {
    import spark.implicits._
    val ds = StructuredOutput.parse[SimpleModel](
      Seq("""{"answer":"ok","confidence":1.0}""", "not json at all").toDS())
    val rows = ds.collect()
    assert(rows.toSeq === Seq(SimpleModel("ok", 1.0)))

    // strict mode surfaces the malformed row as a job failure instead
    intercept[Exception] {
      StructuredOutput.parse[SimpleModel](
        Seq("nope").toDS(), strict = true).collect()
    }
  }

  test("maps parse into Scala maps") {
    import spark.implicits._
    val out = StructuredOutput.parse[NestedModel](
      Seq("""{"name":"n1","value":5,"metadata":{"k":"v"}}""").toDS()).head()
    assert(out.metadata === Map("k" -> "v"))
  }
}
