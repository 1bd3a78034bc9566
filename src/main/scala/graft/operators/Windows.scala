package graft.operators

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/**
 * Relational core, part 3: window functions, top-k, sort/limit
 * (SURVEY.md §2a).
 *
 * Ranking outputs are cast to LONG: Spark's rank/dense_rank/row_number
 * return IntegerType while DuckDB's return BIGINT — without the cast the
 * driver's schema compare would fail on dtype.
 *
 * Scale notes (100 TB): windows shuffle once by partition key, then sort
 * within partitions — scales with the largest single key's row count (a
 * customer's orders fit trivially). Global sort_limit plans as
 * TakeOrderedAndProject: per-partition top-k + driver merge of k·p rows,
 * never a full global sort.
 */
object Windows {

  // Deterministic per-customer order: totalprice desc, orderkey tiebreak.
  private def byCustPrice = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private def byCustDate = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  val queries: Map[String, QFn] = Map(
    "window_rank" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          rank().over(byCustPrice).cast("long").as("rnk"),
          dense_rank().over(byCustPrice).cast("long").as("drnk"),
          row_number().over(byCustPrice).cast("long").as("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "window_value_fns" -> ((s, d) => {
      // Positional value functions over the full partition frame: each
      // order sees its customer's costliest, cheapest, and second-
      // costliest order. Frame is unbounded-both so first/last/nth are
      // well-defined (default frame would cut last_value at CURRENT ROW).
      val full = byCustPrice
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          first(col("o_totalprice")).over(full).as("top_price"),
          last(col("o_totalprice")).over(full).as("bottom_price"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "window_lag_lead" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(byCustDate).as("prev_price"),
          lead(col("o_totalprice"), 1).over(byCustDate).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "window_running" -> ((s, d) => {
      // Running money sum in exact DECIMAL per frame → double out (§7d).
      val w = byCustDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "window_share" -> ((s, d) => {
      // Share-of-total: each order's percentage of its customer's spend —
      // the contribution/mix-shift shape every revenue dashboard carries.
      // The denominator is the exact whole-partition DECIMAL sum (one
      // window, no self-join against a totals table); the single double
      // division has identical operands on both engines, rounded 4 dp.
      val w = Window.partitionBy(col("o_custkey"))
      val dec = col("o_totalprice").cast(DecimalType(18, 4))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          Q.r4(dec.cast("double") * 100 /
            sum(dec).over(w).cast("double")).as("pct_of_cust"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "window_range_frame" -> ((s, d) => {
      // RANGE frame on the numeric order key: all orders within 10k below
      // the current price. Peer rows (price ties) are all included, so the
      // result is deterministic even with duplicate prices.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("nearby_sum"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "window_time_rolling" -> ((s, d) => {
      // TIME-based rolling frame: per user, count/sum of events in the
      // trailing hour. Spark's rangeBetween is numeric, so the order key
      // is epoch seconds — [tsec - 3599, tsec] ≡ RANGE INTERVAL 1 HOUR
      // PRECEDING (inclusive) — and the oracle uses the same numeric
      // formulation so frame membership is bit-identical. One shuffle by
      // user; decimal accumulation keeps the sliding sum exact.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tsec"))
        .rangeBetween(-3599, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("ts").cast("long").as("tsec"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast("double"))
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"), col("n_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    }),

    "topk_per_group" -> ((s, d) => {
      // Window + filter: the standard scalable top-k-per-group (no global
      // sort; AQE handles skewed customers).
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byCustPrice).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    "window_distribution" -> ((s, d) => {
      // Distribution functions: ntile quartiles, percent_rank, cume_dist —
      // total order (price desc, orderkey) keeps tile assignment stable.
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(byCustPrice).cast("long").as("quartile"),
          Q.r4(percent_rank().over(byCustPrice)).as("pct_rank"),
          Q.r4(cume_dist().over(byCustPrice)).as("cume"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "sort_limit" -> ((s, d) => {
      // Global top-100 with full tiebreak → TakeOrderedAndProject.
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }))

  val oracleSql: Map[String, String] = Map(
    "window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
        | ROW_NUMBER() OVER w AS rn
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "window_value_fns" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | FIRST_VALUE(o_totalprice) OVER w AS top_price,
        | LAST_VALUE(o_totalprice) OVER w AS bottom_price,
        | NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | LAG(o_totalprice, 1) OVER w AS prev_price,
        | LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_share" ->
      """SELECT o_custkey, o_orderkey,
        | ROUND(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) * 100
        |   / CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |       PARTITION BY o_custkey) AS DOUBLE), 4) AS pct_of_cust
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_totalprice
        |   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |   AS nearby_sum
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "window_time_rolling" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |  CAST(FLOOR(EPOCH(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tsec FROM events)
        |SELECT event_id, user_id, ts,
        | COUNT(*) OVER (PARTITION BY user_id ORDER BY tsec
        |   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS n_1h,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
        |   PARTITION BY user_id ORDER BY tsec
        |   RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h
        |FROM e ORDER BY event_id""".stripMargin,

    "topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "window_distribution" ->
      """SELECT o_custkey, o_orderkey,
        | NTILE(4) OVER w AS quartile,
        | ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        | ROUND(CUME_DIST() OVER w, 4) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin)
}
