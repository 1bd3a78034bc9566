package graft.operators

import graft.Tables
import graft.Q.QFn

/**
 * The pure-SQL entry point: the same engine driven entirely through
 * `spark.sql(...)` over registered views — a user who writes SQL (not
 * the DataFrame API) gets the identical Catalyst plans, pushdowns, and
 * join strategies; nothing in this library is DataFrame-API-only. (The
 * custom kernels are SQL-reachable too, via GraftExtensions — tested in
 * KernelSpec.)
 *
 * `sql_q3` is the TPC-H Q3 shape: 3-way fact join, filter on all three
 * inputs, revenue aggregate, top-10. Catalyst plans it exactly as the
 * DataFrame twin would — filters pushed to all three scans, broadcast
 * of the filtered customer side at test sf, TakeOrderedAndProject for
 * the top-10.
 */
object Sql {

  private val q3 =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue,
      |  CAST(o_orderdate AS TIMESTAMP_NTZ) AS orderdate,
      |  o_orderpriority
      |FROM customer
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  val queries: Map[String, QFn] = Map(
    "sql_q3" -> ((s, d) => {
      Seq("customer", "orders", "lineitem").foreach { t =>
        Tables.load(s, d, t).createOrReplaceTempView(t)
      }
      s.sql(q3)
    }))

  val oracleSql: Map[String, String] = Map(
    // DuckDB runs the same text modulo the NTZ cast (its timestamps are
    // already naive).
    "sql_q3" -> q3.replace("CAST(o_orderdate AS TIMESTAMP_NTZ)", "o_orderdate"))
}
