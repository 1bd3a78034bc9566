package graft.operators

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.functions._

/**
 * Relational core, part 2: aggregation family (SURVEY.md §2a).
 *
 * All money sums accumulate in DECIMAL (exact → partial/final agg order
 * can't diverge from DuckDB's single-threaded sum); averages are one
 * double division over the decimal sum; statistical moments are rounded
 * to 4 dp on both engines (SURVEY.md §7d).
 *
 * Scale notes (100 TB): every query here is a hash aggregate with
 * map-side partial aggregation — shuffle volume is #groups × #partitions,
 * not #rows. rollup/cube expand rows by the number of grouping sets
 * before the shuffle; at extreme scale, prefer re-aggregating the finest
 * grouping instead of cube() over high-cardinality dims.
 */
object Aggregates {

  val queries: Map[String, QFn] = Map(
    "agg_group" -> ((s, d) => {
      // TPC-H Q1 shape: 600 M rows → 6 groups at scale; partial aggs make
      // the shuffle negligible.
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Q.moneySum(col("l_quantity")).as("sum_qty"),
          Q.moneySum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .cast("double").as("sum_disc_price"),
          Q.moneyAvg(col("l_quantity")).as("avg_qty"),
          Q.moneyAvg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "agg_distinct" -> ((s, d) => {
      // countDistinct plans as a two-phase expand+agg — scales by
      // (group, partkey) cardinality, no driver-side set.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_rollup" -> ((s, d) => {
      // Null-coded subtotal rows surfaced via COALESCE sentinels so the
      // output has non-nullable sort keys (§7d rule 1; DuckDB's default
      // NULLS LAST differs from Spark's NULLS FIRST).
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), Q.moneySum(col("c_acctbal")).as("sum_bal"))
        .select(
          coalesce(col("n_name"), lit("<all>")).as("nation"),
          coalesce(col("c_mktsegment"), lit("<all>")).as("segment"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("nation"), col("segment"))
    }),

    "agg_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .cube(col("c_mktsegment"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), Q.moneySum(col("o_totalprice")).as("sum_price"))
        .select(
          coalesce(col("c_mktsegment"), lit("<all>")).as("segment"),
          coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
          col("n_orders"), col("sum_price"))
        .orderBy(col("segment"), col("priority"))
    }),

    "agg_stats" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          Q.r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          Q.r4(var_samp(col("l_quantity"))).as("var_qty"),
          Q.r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_weighted" -> ((s, d) => {
      // Quantity-weighted average price per flag — the weighted-mean
      // aggregate every mixture/quality pipeline reaches for. Exactness:
      // price and weight each cast DECIMAL(18,4), their product is a
      // wider exact decimal, both SUMs accumulate exactly (order-
      // independent, immune to partial-agg ordering), and the single
      // double division at the end has identical operands on both
      // engines. One hash agg with map-side partials — shuffle is
      // #groups.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          Q.r4(
            sum(Q.dec(col("l_extendedprice")) * Q.dec(col("l_quantity")))
              .cast("double")
              / sum(Q.dec(col("l_quantity"))).cast("double"))
            .as("wavg_price"),
          Q.moneySum(col("l_quantity")).as("total_weight"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_median" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(Q.r4(median(col("l_quantity"))).as("med_qty"),
          Q.r4(median(col("l_discount"))).as("med_disc"))
        .orderBy(col("l_returnflag"))
    }),

    // Sketch-based distinct: HLL++ differs from DuckDB's HLL, so this is
    // a rows-only gate (SURVEY.md §2a); accuracy vs exact is unit-tested
    // to ±5% in AggregateSpec.
    "agg_approx_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy(col("l_returnflag"))
    }),

    // Pre-aggregated MERGEABLE sketches — the datacube pattern that
    // makes distinct counts distributive at 100 TB: each (priority,
    // month) partial builds its own Datasketches-HLL state, and the
    // rollup UNIONS the states instead of re-scanning raw rows. A 100 TB
    // fact table materializes the partial-sketch table once (tiny: one
    // sketch blob per cell), and every rollup/regrouping after that is
    // sketch-side only — the query below carries both levels in one
    // plan. HLL register state is max-merge, so the result is
    // insertion-order-independent and deterministic. Rows-only gate
    // (DuckDB's approx sketch differs); the union estimate is
    // property-gated ±5% vs exact, and union-vs-flat-sketch equality is
    // asserted in OperatorSpec (mergeability, the property the pattern
    // rests on).
    "agg_hll_partitioned" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val partials = o
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("m"))
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      partials
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_partials"),
          expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_custs"))
        .join(exact, "o_orderpriority")
        .select(col("o_orderpriority"), col("n_partials"),
          col("approx_custs"), col("exact_custs"),
          (abs(col("approx_custs") - col("exact_custs")) * lit(10000L)
            / col("exact_custs")).cast("long").as("err_bp"))
        .orderBy(col("o_orderpriority"))
    }),

    "agg_approx_quantile" -> ((s, d) => {
      // Sketch-based percentiles (constant state per group, mergeable —
      // the 100 TB path when exact percentile's per-group sort is too
      // hot). ORACLE-CHECKED since r10 (VERDICT r9 #5, the ann_mrl
      // move): at accuracy=10⁶ the Greenwald-Khanna summary never
      // compresses below the ~20k-row verify-sf groups, so the sketch
      // answer IS the exact lower-rank order statistic — DuckDB's
      // QUANTILE_DISC — while remaining a bounded mergeable sketch at
      // scale (rank error ≤ n/10⁶: ±200 ranks on a 2×10⁸-row group,
      // state capped independent of n). Verified convention (empirical
      // n=2..30 sweep, both engines): the ⌈p·n⌉-th smallest element —
      // e.g. p90 of {1,2,3,4} → 4, p50 of {1,2,3,4} → 2 — which is
      // exactly DuckDB's QUANTILE_DISC.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000000))
            .as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(1000000))
            .as("p90_price"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_percentiles" -> ((s, d) => {
      // Exact interpolated percentiles (DuckDB QUANTILE_CONT twin); both
      // engines interpolate linearly — rounded 4dp since the two
      // formulations differ in final-ulp arithmetic.
      // ONE multi-percentile aggregate (r17 optimization round; guide
      // §1.2 per-task work): three separate percentile() calls are
      // three ImperativeAggregates, each buffering and sorting EVERY
      // group value — the array form shares one buffer and one sort,
      // and Spark's Percentile evaluates single and multiple
      // percentages through the same interpolation, so the rounded
      // values (and the oracle hash) are bit-identical.
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr(
          "percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D))").as("ps"))
        .select(col("l_returnflag"),
          Q.r4(element_at(col("ps"), 1)).as("p25"),
          Q.r4(element_at(col("ps"), 2)).as("p50"),
          Q.r4(element_at(col("ps"), 3)).as("p95"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_argmax" -> ((s, d) => {
      // max_by/min_by (ARG_MAX/ARG_MIN): which order is the biggest per
      // priority class. Cross-engine ties are nondeterministic, so the
      // ordering key is made UNIQUE by construction (VERDICT r3 #5):
      // o_totalprice has exactly 2 decimal digits → price×100 is an exact
      // integer after the scale-4 decimal cast; ×10¹⁰ then leaves room to
      // add the (unique) o_orderkey as tiebreak — one exact BIGINT both
      // engines compare identically (max price 6e5 → key ≤ 6e17 < 2⁶³).
      // One hash agg, shuffle is #groups — max_by's state is a single
      // (key, value) pair per group, the cheap form of topk_per_group k=1.
      val ordKey = (Q.dec(col("o_totalprice")) * 100).cast("long") *
        lit(10000000000L) + col("o_orderkey")
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_orderkey"), ordKey).as("top_orderkey"),
          min_by(col("o_orderkey"), ordKey).as("bottom_orderkey"),
          max(col("o_totalprice")).as("top_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "agg_regr" -> ((s, d) => {
      // Linear-regression aggregates (SQL:2016 REGR_* family): slope /
      // intercept / R² of l_extendedprice on l_quantity per return flag —
      // the one-pass co-moment form (never a collect, never two scans).
      // Same single-hash-agg shape as agg_stats; state per group is five
      // doubles, so the shuffle is #groups no matter the corpus size.
      // 4dp rounding on both engines absorbs co-moment fp accumulation
      // drift (values ~5e4 → abs drift ~1e-8, far inside the half-ulp).
      val (y, x) = (col("l_extendedprice"), col("l_quantity"))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          regr_count(y, x).as("n_pairs"),
          Q.r4(regr_slope(y, x)).as("slope"),
          Q.r4(regr_intercept(y, x)).as("intercept"),
          Q.r4(regr_r2(y, x)).as("r2"))
        .orderBy(col("l_returnflag"))
    }),

    "agg_stringagg" -> ((s, d) => {
      // Ordered string aggregation (collect → sort → join; DuckDB
      // STRING_AGG ... ORDER BY twin).
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations_csv"))
        .orderBy(col("r_name"))
    }),

    "agg_collect" -> ((s, d) => {
      // collect_list order is nondeterministic → array_sort; the sorted
      // array is then serialized to CSV because the driver's comparator
      // can't hash array cells (§7d: no array/binary verify output, ever —
      // round-1 CORRECTNESS proved SURVEY's old "sorted arrays OK" wrong).
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n_nations"))
        .orderBy(col("r_name"))
    }),

    "agg_grouping_sets" -> ((s, d) => {
      // Explicit GROUPING SETS ((nation), (segment)) — the general form
      // rollup/cube are sugar for: two independent one-dim aggregates in
      // ONE pass over the join (the expand operator emits a row per set,
      // partial aggs keep the shuffle at #groups). Null-coded set members
      // get sentinels for non-nullable sort keys (§7d rule 1).
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupingSets(Seq(Seq(col("n_name")), Seq(col("c_mktsegment"))),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"), Q.moneySum(col("c_acctbal")).as("sum_bal"))
        .select(
          coalesce(col("n_name"), lit("<all>")).as("nation"),
          coalesce(col("c_mktsegment"), lit("<all>")).as("segment"),
          col("n_cust"), col("sum_bal"))
        .orderBy(col("nation"), col("segment"))
    }),

    "agg_filter" -> ((s, d) => {
      // FILTER-clause aggregates: several differently-conditioned
      // aggregates in one scan + one shuffle (the alternative — one scan
      // per condition — multiplies I/O at 100 TB). Null sums from empty
      // filter sets are coalesced identically on both engines.
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("count(*) FILTER (WHERE o_orderpriority = '1-URGENT')").as("n_urgent"),
          coalesce(
            expr("SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (WHERE o_orderpriority = '1-URGENT')")
              .cast("double"), lit(0.0)).as("urgent_price"),
          expr("count(*) FILTER (WHERE o_totalprice > 300000)").as("n_big"),
          count(lit(1)).as("n_total"))
        .orderBy(col("o_orderstatus"))
    }),

    "agg_mode" -> ((s, d) => {
      // Deterministic mode: most frequent priority per status, ties to
      // the lexicographically smallest value — never the built-in mode(),
      // whose tie winner is implementation-defined (same policy as
      // knn_label's vote).
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("n").desc, col("o_orderpriority"))
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
          col("n"))
        .orderBy(col("o_orderstatus"))
    }),

    "agg_histogram" -> ((s, d) => {
      // Fixed-width histogram: bucket = floor(x / w) is a plain group key
      // — one hash agg, #buckets groups, no sort of the data. (Spark's
      // floor(double) is already BIGINT; DuckDB's needs the cast.)
      val w = 50000
      Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / w).as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          Q.moneySum(col("o_totalprice")).as("sum_price"))
        .select(col("bucket"),
          (col("bucket") * w).cast("double").as("lo"),
          ((col("bucket") + 1) * w).cast("double").as("hi"),
          col("n_orders"), col("sum_price"))
        .orderBy(col("bucket"))
    }))

  val oracleSql: Map[String, String] = Map(
    "agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        | ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_argmax" ->
      """SELECT o_orderpriority,
        | ARG_MAX(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |   * 10000000000 + o_orderkey) AS top_orderkey,
        | ARG_MIN(o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)
        |   * 10000000000 + o_orderkey) AS bottom_orderkey,
        | MAX(o_totalprice) AS top_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "agg_regr" ->
      """SELECT l_returnflag,
        | CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
        | ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 4) AS slope,
        | ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS intercept,
        | ROUND(REGR_R2(l_extendedprice, l_quantity), 4) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      """SELECT COALESCE(n_name, '<all>') AS nation,
        | COALESCE(c_mktsegment, '<all>') AS segment,
        | COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(n_name, c_mktsegment)
        |ORDER BY nation, segment""".stripMargin,

    "agg_cube" ->
      """SELECT COALESCE(c_mktsegment, '<all>') AS segment,
        | COALESCE(o_orderpriority, '<all>') AS priority,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY CUBE(c_mktsegment, o_orderpriority)
        |ORDER BY segment, priority""".stripMargin,

    "agg_stats" ->
      """SELECT l_returnflag,
        | ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
        | ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
        | ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        | MIN(l_quantity) AS min_qty,
        | MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_median" ->
      """SELECT l_returnflag,
        | ROUND(MEDIAN(l_quantity), 4) AS med_qty,
        | ROUND(MEDIAN(l_discount), 4) AS med_disc
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_weighted" ->
      """SELECT l_returnflag,
        | ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
        |     * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4)
        |   AS wavg_price,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_weight
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_collect" ->
      """SELECT r_name,
        | ARRAY_TO_STRING(LIST_SORT(LIST(n_name)), ',') AS nations,
        | COUNT(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    // Exact at verify sf because accuracy=10⁶ retains every sample of
    // the ~20k-row groups (see the queries entry); QUANTILE_DISC is the
    // lower-rank convention Spark's GK query(p) uses.
    "agg_approx_quantile" ->
      """SELECT l_returnflag,
        | QUANTILE_DISC(l_extendedprice, 0.5) AS p50_price,
        | QUANTILE_DISC(l_extendedprice, 0.9) AS p90_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_percentiles" ->
      """SELECT l_returnflag,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
        | ROUND(QUANTILE_CONT(l_extendedprice, 0.95), 4) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "agg_stringagg" ->
      """SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT COALESCE(n_name, '<all>') AS nation,
        | COALESCE(c_mktsegment, '<all>') AS segment,
        | COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (c_mktsegment))
        |ORDER BY nation, segment""".stripMargin,

    "agg_filter" ->
      """SELECT o_orderstatus,
        | COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
        | COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |   FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE), 0.0)
        |   AS urgent_price,
        | COUNT(*) FILTER (WHERE o_totalprice > 300000) AS n_big,
        | COUNT(*) AS n_total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "agg_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
        | SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        | FROM orders GROUP BY 1, 2) t
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |  ORDER BY n DESC, o_orderpriority) = 1
        |ORDER BY o_orderstatus""".stripMargin,

    "agg_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
        | CAST(CAST(FLOOR(o_totalprice / 50000) AS BIGINT) * 50000 AS DOUBLE) AS lo,
        | CAST((CAST(FLOOR(o_totalprice / 50000) AS BIGINT) + 1) * 50000 AS DOUBLE) AS hi,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2, 3 ORDER BY bucket""".stripMargin)
}
