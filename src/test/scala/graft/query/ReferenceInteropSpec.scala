package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drop-in read compatibility with logs written by the REFERENCE
  * implementation: the fixture under `src/test/resources/reference_logs`
  * was generated with the reference's exact parquet schema
  * (logger.py:22-29) and payload envelope (logger.py:168-187, handler
  * data fields logger.py:252-307) by `tools/make_reference_fixture.py`.
  * A user switching from the reference package keeps their existing log
  * directories — every graft read-side query must work on them unchanged.
  */
class ReferenceInteropSpec extends SparkSpec {

  private def logs = LogTable.read(spark,
    getClass.getResource("/reference_logs").getPath)

  test("reference-written parquet loads through LogTable.read with the " +
    "declared schema and date partition") {
    val df = logs.df
    assert(df.count() === 5L)
    assert(df.schema.fieldNames.contains("date"))
    assert(df.filter(col("date") === "2025-01-15").count() === 5L)
  }

  test("event counts, hierarchy, and custom-id columns work unchanged") {
    val counts = logs.eventCounts.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("llm_start" -> 1L, "llm_end" -> 1L,
      "chain_start" -> 1L, "tool_start" -> 1L, "tool_end" -> 1L))
    assert(logs.childrenOf("run-2").count() === 2L)
    assert(logs.roots.count() === 3L)
  }

  test("token usage aggregates from the reference's llm_end payload " +
    "shape (data.usage map)") {
    val usage = logs.tokenUsageByCustomId.collect()
    assert(usage.length === 1)
    assert(usage.head.getString(0) === "order-7")
    assert(usage.head.getLong(1) === 46L)
  }

  test("typed payload projection reads the reference envelope: prompts, " +
    "tags, execution ids") {
    val p = logs.byEventType("llm_start").parsed
      .select(col("p.data.prompts")(0), col("p.execution.custom_id"),
        col("p.execution.tags")(0))
      .head()
    assert(p.getString(0) === "Summarize the order")
    assert(p.getString(1) === "order-7")
    assert(p.getString(2) === "custom_id:order-7")
  }
}
