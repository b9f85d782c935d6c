package graft

/** The driver's t1 smoke contract: entry() on sf0.001 returns rows. */
class EntrySpec extends SparkSpec {

  test("entry() answers the flagship query with rows > 0") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(df.columns.toSeq === Seq("user_id", "total_k", "n_events"))
  }

  test("every query has a unique name and every oracle points at a query") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    assert(names.size == queries.Registry.all.size)
  }
}
