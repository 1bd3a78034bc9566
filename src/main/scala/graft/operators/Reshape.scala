package graft.operators

import graft.Tables
import graft.Q.QFn
import org.apache.spark.sql.functions._

/**
 * Reshaping + subquery operators (rounding out SURVEY.md §2a): pivot
 * (long→wide), unpivot (wide→long), and a correlated scalar subquery that
 * exercises Catalyst's decorrelation (RewriteCorrelatedScalarSubquery →
 * joins — the one §4 rewrite previously unexercised).
 *
 * Pivot uses an EXPLICIT value list: at 100 TB, `pivot(col)` without
 * values triggers a driver-side distinct scan; with the list it's one
 * pass. The DuckDB oracles spell pivot as conditional aggregation and
 * unpivot as UNION ALL — dialect-stable forms.
 */
object Reshape {

  private val priorities = Seq(
    "1-URGENT" -> "n_urgent", "2-HIGH" -> "n_high", "3-MEDIUM" -> "n_medium",
    "4-NOT SPECIFIED" -> "n_notspec", "5-LOW" -> "n_low")

  val queries: Map[String, QFn] = Map(
    "pivot_wide" -> ((s, d) => {
      val base = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .pivot("o_orderpriority", priorities.map(_._1))
        .agg(count(lit(1)))
      val renamed = priorities.foldLeft(base) { case (df, (v, name)) =>
        df.withColumn(name, coalesce(col(s"`$v`"), lit(0L))).drop(v)
      }
      renamed.orderBy(col("c_mktsegment"))
    }),

    "unpivot_long" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
    }),

    "subquery_corr" -> ((s, d) => {
      // Customers above their nation's average balance. The predicate is
      // cross-multiplied (bal·count > sum, both exact DECIMAL) so neither
      // engine divides — an avg comparison would flap on rows whose
      // balance sits within FP noise of the mean.
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql(
        """SELECT c_custkey, c_nationkey, c_acctbal FROM customer_v c
          |WHERE CAST(c_acctbal AS DECIMAL(18,4)) *
          |      (SELECT COUNT(*) FROM customer_v c2
          |       WHERE c2.c_nationkey = c.c_nationkey)
          |    > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
          |       FROM customer_v c2
          |       WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c_custkey""".stripMargin)
    }))

  val oracleSql: Map[String, String] = Map(
    "pivot_wide" ->
      ("""SELECT c_mktsegment,
         |""".stripMargin +
        priorities.map { case (v, name) =>
          s" COUNT(*) FILTER (WHERE o_orderpriority = '$v') AS $name"
        }.mkString(",\n") +
        """
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    "unpivot_long" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        |FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice' AS metric, p_retailprice AS value
        |FROM part
        |ORDER BY p_partkey, metric""".stripMargin,

    "subquery_corr" ->
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) *
        |      (SELECT COUNT(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
        |       FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
}
