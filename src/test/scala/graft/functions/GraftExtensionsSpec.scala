package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end proof of the production registration route: a session built
  * with `withExtensions(new GraftExtensions)` (the programmatic twin of
  * `spark.sql.extensions=graft.functions.GraftExtensions`) must resolve
  * the native functions, fire the Jaccard rewrite rule, and plan the
  * custom as-of operator — with NO call to
  * `GraftFunctions.ensureRegistered`.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions-built session gets functions, optimizer rule, and strategy") {
    val base = spark // force shared-session init before we swap defaults
    base.catalog.listTables() // touch it so lazy init completes
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      // 1. injected functions resolve in plain SQL
      val r = s2.sql(
        """SELECT md5num('hello') AS h,
                  size(minhash_sig(array('a b c'))) AS m,
                  simhash60(array('x')) AS s,
                  jaccard_sim(array('a','b'), array('b','c')) AS j""").head()
      assert(r.getLong(0) === 419982666956583591L)
      assert(r.getInt(1) === 16)
      assert(r.getDouble(3) === 1.0 / 3.0)

      // 2. injected optimizer rule rewrites the composable Jaccard form
      val words = split(col("text"), " ")
      val df = s2.read.parquet(s"${sf()}/documents.parquet")
        .select(words.as("a"), reverse(words).as("b"))
        .select((size(array_intersect(col("a"), col("b"))).cast("double")
          / size(array_union(col("a"), col("b"))).cast("double")).as("jac"))
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("jaccard_sim"))

      // 3. injected planner strategy executes the custom as-of node
      import s2.implicits._
      val left = Seq((1L, 10L, 100L)).toDF("id", "k", "t")
      val right = Seq((10L, 90L, 7L))
        .toDF("k2", "t2", "pid")
      val lp = left.queryExecution.analyzed
      val rp = right.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          n: String) = p.output.find(_.name == n).get
      val node = graft.plans.AsOfJoinNode(lp, rp,
        attr(lp, "k"), attr(rp, "k2"), attr(lp, "t"), attr(rp, "t2"))
      val joined = org.apache.spark.sql.graftshim.dataFrame(
        s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
      val row = joined.select("id", "pid").head()
      assert(row.getLong(0) === 1L && row.getLong(1) === 7L)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
