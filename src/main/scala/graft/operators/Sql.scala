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

  /** Near-dup pairs written entirely in SQL, using the CUSTOM CODEGEN'D
    * KERNEL (`jaccard_sorted`, registered by GraftExtensions) inside a
    * plain SQL text — the proof that the extension surface is a
    * first-class SQL citizen, not a DataFrame-API convenience. Exact
    * all-pairs form (the oracle stand-in shape, like embed_neardup);
    * the scale arm remains tokjoin_auto. */
  private val neardup =
    """WITH toks AS (
      |  SELECT doc_id,
      |    array_sort(transform(array_distinct(split(text, ' ')),
      |      t -> xxhash64(t))) AS ta
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  ROUND(jaccard_sorted(a.ta, b.ta), 4) AS jaccard
      |FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      |WHERE jaccard_sorted(a.ta, b.ta) >= 0.95
      |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, QFn] = Map(
    "sql_q3" -> ((s, d) => {
      Seq("customer", "orders", "lineitem").foreach { t =>
        Tables.load(s, d, t).createOrReplaceTempView(t)
      }
      s.sql(q3)
    }),

    "sql_neardup" -> ((s, d) => {
      graft.plans.GraftExtensions.register(s)
      Tables.load(s, d, "documents").createOrReplaceTempView("documents")
      s.sql(neardup)
    }))

  val oracleSql: Map[String, String] = Map(
    // DuckDB runs the same text modulo the NTZ cast (its timestamps are
    // already naive).
    "sql_q3" -> q3.replace("CAST(o_orderdate AS TIMESTAMP_NTZ)", "o_orderdate"),

    // The DuckDB twin computes the same exact token-set Jaccard
    // relationally (xxhash64 isn't portable, but set sizes are
    // hash-invariant — the same argument dedup_near's verify relies on).
    "sql_neardup" ->
      """WITH t AS (SELECT doc_id,
        |             UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS tok
        |           FROM documents),
        | s AS (SELECT doc_id, COUNT(*) AS n FROM t GROUP BY doc_id),
        | p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        |       FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |       GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        | ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 4) AS jaccard
        |FROM p JOIN s sa ON p.doc_a = sa.doc_id JOIN s sb ON p.doc_b = sb.doc_id
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.95
        |ORDER BY doc_a, doc_b""".stripMargin)
}
