package graft.queries

/** Subquery surface, exercised through `spark.sql` so the whole
  * parse → analyze → decorrelate pipeline runs: EXISTS (rewritten to a
  * left-semi join), a correlated scalar subquery (decorrelated into an
  * aggregate + join), and nested IN chains (collapsed to semi joins).
  * At scale every one of these rewrites is the difference between a
  * per-row re-scan and a single co-partitioned join — the engine relies
  * on Catalyst's RewriteSubquery/DecorrelateInnerQuery batches rather
  * than hand-written plans.
  */
object SubqueryQueries {

  private def view(s: org.apache.spark.sql.SparkSession, dir: String,
      name: String, as: String): Unit =
    tbl(s, dir, name).createOrReplaceTempView(as)

  /** EXISTS → left-semi join: customers with at least one urgent order. */
  val existsUrgent = Q(
    "q_exists_urgent",
    (s, dir) => {
      view(s, dir, "customer", "customer_sq")
      view(s, dir, "orders", "orders_sq")
      s.sql("""SELECT c_custkey, c_name, c_mktsegment
               FROM customer_sq c
               WHERE EXISTS (SELECT 1 FROM orders_sq o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_orderpriority = '1-URGENT')
               ORDER BY c_custkey""")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""))

  /** Correlated scalar subquery → decorrelated aggregate join: each
    * customer's most expensive order(s). MAX over doubles is exact, so
    * the equality predicate is engine-stable.
    */
  val scalarSubqueryMax = Q(
    "q_scalar_subquery_max",
    (s, dir) => {
      view(s, dir, "orders", "orders_sq2")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
               FROM orders_sq2 o
               WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
                                     FROM orders_sq2 o2
                                     WHERE o2.o_custkey = o.o_custkey)
               ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders o
            WHERE o_totalprice = (SELECT MAX(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
            ORDER BY o_orderkey"""))

  /** Nested IN subqueries → chained semi joins: suppliers located in the
    * EUROPE region, resolved dimension-first.
    */
  val inNested = Q(
    "q_in_nested",
    (s, dir) => {
      view(s, dir, "supplier", "supplier_sq")
      view(s, dir, "nation", "nation_sq")
      view(s, dir, "region", "region_sq")
      s.sql("""SELECT s_suppkey, s_name
               FROM supplier_sq
               WHERE s_nationkey IN (
                 SELECT n_nationkey FROM nation_sq
                 WHERE n_regionkey IN (
                   SELECT r_regionkey FROM region_sq WHERE r_name = 'EUROPE'))
               ORDER BY s_suppkey""")
    },
    Some("""SELECT s_suppkey, s_name
            FROM supplier
            WHERE s_nationkey IN (
              SELECT n_nationkey FROM nation
              WHERE n_regionkey IN (
                SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
            ORDER BY s_suppkey"""))

  val all: Seq[Q] = Seq(existsUrgent, scalarSubqueryMax, inNested)
}
