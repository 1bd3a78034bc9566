package graft.operators

import graft.Tables
import graft.Q.QFn
import org.apache.spark.sql.functions._

/**
 * Relational core, part 4: set operations (SURVEY.md §2a).
 *
 * Spark's intersect/except are DISTINCT set semantics, exactly matching
 * SQL INTERSECT/EXCEPT. unionByName is position-independent (safer than
 * union when slices are built separately).
 *
 * Scale note: intersect/except plan as left-semi/left-anti joins over
 * distinct inputs — one shuffle each on the compared columns.
 */
object SetOps {

  val queries: Map[String, QFn] = Map(
    "set_union" -> ((s, d) => {
      // UNION ALL of two overlapping slices; cnt=2 marks rows in both —
      // the dedup-sensitive variant in one deterministic output.
      val o = Tables.orders(s, d)
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val b = o.filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"))
      a.unionByName(b)
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("o_orderkey"))
    }),

    "set_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .intersect(
          o.filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }),

    "set_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .except(
          o.filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey")))
        .orderBy(col("o_custkey"))
    }))

  val oracleSql: Map[String, String] = Map(
    "set_union" ->
      """SELECT o_orderkey, COUNT(*) AS cnt FROM (
        | SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
        | UNION ALL
        | SELECT o_orderkey FROM orders WHERE o_totalprice > 400000) t
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin,

    "set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY o_custkey""".stripMargin)
}
