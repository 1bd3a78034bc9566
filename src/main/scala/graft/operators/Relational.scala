package graft.operators

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Relational core, part 1: scan/projection, filters, and the join family
 * (SURVEY.md §2a). plankton itself has no relational operators (it is a
 * task-DAG orchestrator — SURVEY.md §1a); this is the engine capability
 * surface a plankton-style ETL pipeline exercises, expressed declaratively
 * so Catalyst handles pushdown, pruning, and join-strategy selection.
 *
 * Scale notes (100 TB):
 *  - dim joins (nation/region/supplier at any sf, customer at small sf)
 *    are explicitly `broadcast()` — no shuffle of the fact side;
 *  - fact⋈fact joins shuffle on the join key once; with bucketed tables
 *    (bucketBy(orderkey)) they'd become zero-shuffle — noted, not needed
 *    at test sf;
 *  - the theta join keeps the small build side broadcast (BNLJ), never a
 *    shuffled cartesian;
 *  - the as-of join is a single partition-local window after one shuffle
 *    by user — the standard scalable formulation (no per-row lookup).
 */
object Relational {

  /**
   * (Re)create the bucketed+sorted lineitem/orders pair for
   * `join_bucketed`, once per (session, sfDir). Idempotent and
   * crash-safe: the guard requires BOTH tables (a run that died between
   * the two saveAsTable calls leaves one behind; guarding on only the
   * first would then skip creation forever and fail on the second —
   * ADVICE r2). When either is missing the pair is dropped and rebuilt
   * together. Returns (lineitemTable, ordersTable).
   *
   * Callers that want write cost out of their measurement (Bench) call
   * this ahead of the timed section; the query path calls it too, so it
   * stays self-contained for Verify/driver runs.
   */
  def ensureBucketedTables(s: org.apache.spark.sql.SparkSession,
                           d: String): (String, String) = {
    val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
    val (lt, ot) = (s"lineitem_bkt_$tag", s"orders_bkt_$tag")
    // A fresh session's in-memory catalog has no tables, but the
    // warehouse DIRECTORY survives across sessions — CTAS refuses a
    // managed table whose location already exists. Drop both layers.
    def dropStale(t: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    if (!s.catalog.tableExists(lt) || !s.catalog.tableExists(ot)) {
      dropStale(lt)
      dropStale(ot)
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
    }
    (lt, ot)
  }

  /**
   * (Re)create the date-partitioned events table for `scan_pruned_date`,
   * once per (session, sfDir) — same warehouse lifecycle as
   * [[ensureBucketedTables]]. Hive-style layout `d=<date>/...`: at
   * 100 TB this is THE canonical event-log layout — a day query touches
   * one directory, not the table (the partition filter never reads
   * non-matching files, asserted in PlanShapeSpec).
   */
  def ensureDatePartitionedEvents(s: org.apache.spark.sql.SparkSession,
                                  d: String): String = {
    val tag = d.replaceAll("[^0-9a-zA-Z]", "_")
    val t = s"events_bydate_$tag"
    if (!s.catalog.tableExists(t)) {
      s.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      Tables.events(s, d)
        .withColumn("d", to_date(col("ts")))
        .write.mode("overwrite").format("parquet")
        .partitionBy("d").saveAsTable(t)
    }
    t
  }

  val queries: Map[String, QFn] = Map(
    "scan_pruned_date" -> ((s, d) => {
      // One-day slice of a date-partitioned event log: the `d =` predicate
      // resolves against the hive partition layout (PartitionFilters in
      // the scan — plan-pinned), so only that day's directory is listed
      // and read. The 100 TB story behind README's partitioning note,
      // asserted rather than narrated.
      val t = Relational.ensureDatePartitionedEvents(s, d)
      s.table(t)
        .filter(col("d") === lit(java.sql.Date.valueOf("2024-01-15")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), Q.moneySum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    "scan_project" -> ((s, d) => {
      // Projection + computed column; filter and 4-col ReadSchema reach the
      // parquet scan via Catalyst pushdown/pruning.
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 45)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("net_price"))
        // ALL output columns in the sort: the regenerated corpus has up
        // to 6 lineitem rows per (orderkey, linenumber), so the pair is
        // not a total key — §7d rule 1 was latently violated for seven
        // rounds, masked by Spark and DuckDB sharing the single-file row
        // order (exposed when layout repair re-ordered the managed copy).
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("net_price"))
    }),

    "filter_pred" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(
          col("l_shipdate").between("1996-01-01", "1996-12-31") &&
          col("l_quantity").isin(10, 20, 30, 40) &&
          (col("l_returnflag") === "A" || col("l_discount").between(0.05, 0.07)))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_discount"))
        // total order over all outputs — see scan_project's note
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"), col("l_discount"))
    }),

    "filter_null_case" -> ((s, d) => {
      // CASE WHEN buckets + coalesce over LEFT-JOIN-produced nulls.
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(
          col("c_custkey"),
          coalesce(col("o_orderkey"), lit(-1L)).as("okey"),
          when(col("o_totalprice").isNull, "none")
            .when(col("o_totalprice") > 300000, "big")
            .otherwise("small").as("bucket"),
          coalesce(col("o_totalprice"), lit(0.0)).as("val"))
        .orderBy(col("c_custkey"), col("okey"))
    }),

    "join_inner" -> ((s, d) => {
      // Fact⋈fact equi-join; Catalyst picks shuffle join, AQE may demote
      // to broadcast at small sf. At 100 TB: bucket both by orderkey.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .filter(col("o_totalprice") > 400000)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          col("o_orderstatus"), col("l_extendedprice"))
        // total order over all outputs — see scan_project's note
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
          col("o_orderstatus"), col("l_extendedprice"))
    }),

    "join_broadcast" -> ((s, d) => {
      // Two explicitly broadcast dims — zero shuffle on the probe side.
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          Q.moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    "join_sortmerge" -> ((s, d) => {
      // Pinned SortMergeJoin via merge hint (plan-shape asserted in tests).
      Tables.lineitem(s, d).hint("merge")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          Q.moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }),

    "join_left_outer" -> ((s, d) => {
      // count(o_orderkey) counts non-nulls → customers with zero orders
      // appear with n_orders = 0.
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    "join_semi" -> ((s, d) => {
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 350000)
      Tables.customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    "join_anti" -> ((s, d) => {
      // NOT EXISTS: customers with no urgent order (plain "no orders" is
      // empty at every sf — all customers have orders).
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "join_theta_range" -> ((s, d) => {
      // Inequality-only condition → BroadcastNestedLoopJoin with the small
      // side broadcast — the DELIBERATE nested-loop demo (plan-pinned).
      // The scale-safe rewrite for range-only predicates is SHIPPED as
      // `join_range_binned`: bin the range key by the window width
      // (here: p_retailprice into 1000-wide bins), explode the probe
      // into its 2 overlapping bins, equi-join on bin + residual.
      // If the "small" side outgrows broadcast, the rewrite's probe
      // broadcast is governed by spark.graft.broadcastSideThreshold /
      // .broadcastSideMaxBytes (Q.maybeBroadcast) — past those gates it
      // degrades to the shuffle equi-join on bin, never back to a BNLJ.
      Tables.supplier(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("s_acctbal") >= col("p_retailprice") - 500 &&
          col("s_acctbal") <= col("p_retailprice") + 500)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_parts"),
          Q.moneySum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("s_suppkey"))
    }),

    "join_time_range" -> ((s, d) => {
      // Interval/range join: pairs of a user's events within 5 minutes of
      // each other. The equi key (user_id) carries the join — the range
      // predicate is a residual filter on each hash/merge match, so this
      // stays a single shuffle by user, never a cartesian. At 100 TB the
      // same shape holds; for range-only joins (no equi key) bucketize
      // time into join keys first.
      val e = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val a = e.select(col("user_id"),
        col("event_id").as("event_a"), col("ts").as("ts_a"))
      val b = e.select(col("user_id").as("user_b"),
        col("event_id").as("event_b"), col("ts").as("ts_b"))
      a.join(b,
          col("user_id") === col("user_b") &&
          col("event_a") < col("event_b") &&
          col("ts_b") >= col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 5 MINUTES"))
        .select(col("user_id"), col("event_a"), col("event_b"),
          (col("ts_b").cast("long") - col("ts_a").cast("long")).as("gap_sec"))
        .orderBy(col("user_id"), col("event_a"), col("event_b"))
    }),

    "join_asof" -> ((s, d) => {
      // As-of join: each purchase paired with the same user's most recent
      // signup at-or-before it. One shuffle by user_id, then a running
      // last(signup_ts) window — the scalable formulation (no row lookups).
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("signup_ts",
          last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        // timestamp_ntz out: Spark would otherwise write parquet
        // isAdjustedToUTC=true and DuckDB-side compares see tz-aware vs
        // naive. Session TZ is UTC, so the cast is value-identity.
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("signup_ts").cast("timestamp_ntz").as("signup_ts"))
        .orderBy(col("event_id"))
    }),

    "join_null_safe" -> ((s, d) => {
      // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
      // match each other instead of silently dropping — the semantics a
      // dimension join needs when "unknown" is itself a category. The
      // NULLs are manufactured (NULLIF on the priority) since the corpus
      // has none; the NULL group's row count proves the null-match path.
      // Plans as an ordinary hash join on a coalesced key. Output key is
      // coalesced to a sentinel so the sort key stays non-nullable (§7d).
      val pri = nullif(col("o_orderpriority"), lit("1-URGENT"))
      val a = Tables.orders(s, d).select(col("o_orderkey"), pri.as("pri"))
      val b = a.select(col("pri")).distinct()
      a.as("a").join(b.as("b"), col("a.pri") <=> col("b.pri"))
        .groupBy(coalesce(col("a.pri"), lit("<null>")).as("pri_key"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("pri_key"))
    }),

    "join_asof_fwd" -> ((s, d) => {
      // FORWARD as-of join — the mirror of join_asof: each signup paired
      // with the same user's NEXT purchase at-or-after it (time-to-
      // convert, SLA-response pairing). Same scalable mechanism run
      // backward: one shuffle by user, a running first(purchase_ts)
      // window over the REVERSED frame (current row → partition end) —
      // still no row lookups and no join.
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      e.withColumn("purchase_ts",
          first(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("timestamp_ntz").as("ts"),
          col("purchase_ts").cast("timestamp_ntz").as("purchase_ts"))
        .orderBy(col("event_id"))
    }),

    "join_range_binned" -> ((s, d) => {
      // Pure range join (NO equi key): lineitems shipped within 30 days
      // of a high-value order's date. Naively this is a
      // BroadcastNestedLoopJoin — quadratic work at scale. The binning
      // rewrite makes it an EQUI join: bucket both sides into
      // 30-day bins (bin width = window width), explode the probe side
      // into its 2 overlapping bins (an order at day d matches ship
      // dates spanning bins ⌊d/30⌋ and ⌊d/30⌋+1), equi-join on bin,
      // then apply the exact range as a residual filter. Candidates per
      // row ∝ rows-per-bin, never the whole table; the join shuffles by
      // bin like any equi join (plan-pinned: SMJ/SHJ, no BNLJ). The
      // oracle is the plain range-join SQL — values identical, only the
      // plan shape differs.
      val binDays = 30
      // Probe = one month's high-value orders: bounds the matched-pair
      // volume (each order matches ~a month of shipments) so the query
      // measures the JOIN SHAPE, not an intentionally huge result set.
      val probe = Tables.orders(s, d)
        .filter(col("o_totalprice") > 400000 &&
          col("o_orderdate").between("1996-01-01", "1996-01-31"))
        .select(col("o_orderkey"), col("o_orderdate"),
          floor(datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
            / binDays).as("bin0"))
        .withColumn("bin", explode(array(col("bin0"), col("bin0") + 1)))
      val build = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          floor(datediff(to_date(col("l_shipdate")), to_date(lit("1970-01-01")))
            / binDays).as("bin"))
      // Conf-gated broadcast of the (small-by-construction) probe side:
      // pins a deterministic BHJ at test scale — planner estimates for
      // the filter+explode subtree drift run-to-run and once flipped
      // this join into a pathological shape (measured: 2.4 s → 193 s in
      // one bench session). Above the row threshold it reverts to the
      // shuffle equi-join on bin, which is the at-scale shape anyway.
      Q.maybeBroadcast(probe).join(build, Seq("bin"))
        .filter(col("l_shipdate") >= col("o_orderdate").cast("timestamp") &&
          col("l_shipdate") <
            date_add(col("o_orderdate"), binDays).cast("timestamp"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_shipped"))
        .orderBy(col("o_orderkey"))
    }),

    "join_full" -> ((s, d) => {
      // FULL OUTER between two derived sets whose keys only partially
      // overlap (rich customers vs customers with a very large order), so
      // both null-extended sides actually surface. The output key is
      // coalesced (non-nullable sort key, §7d rule 1) and a side tag makes
      // the unmatched provenance explicit.
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      val big = Tables.orders(s, d)
        .filter(col("o_totalprice") > 450000)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_big"))
      rich.join(big, col("c_custkey") === col("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          when(col("c_custkey").isNull, "order_only")
            .when(col("o_custkey").isNull, "customer_only")
            .otherwise("both").as("side"),
          coalesce(col("c_acctbal"), lit(0.0)).as("acctbal"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("custkey"))
    }),

    "join_salted" -> ((s, d) => {
      // Manual skew-salting: the (pretend-skewed) probe side gets a
      // deterministic salt in [0, 8); the build side is exploded 8× so
      // every (key, salt) pair still meets its match — one hot key's rows
      // now spread across 8 reducers instead of one. Values are identical
      // to the plain join (the oracle IS the plain join). AQE's skew-join
      // split does this automatically for sort-merge joins; the manual
      // form is what still works in streaming joins, bucketed joins, and
      // non-AQE engines, and lets you target known-hot keys only.
      val S = 8
      val l = Tables.lineitem(s, d)
        .withColumn("lsalt",
          pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(S)).cast("int"))
      val o = Tables.orders(s, d)
        .withColumn("osalt", explode(sequence(lit(0), lit(S - 1))))
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("lsalt") === col("osalt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          Q.moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    "join_bucketed" -> ((s, d) => {
      // Zero-shuffle fact⋈fact: both sides written bucketed AND sorted by
      // the join key (8 buckets) into the session warehouse, then joined —
      // the SortMergeJoin reads co-located buckets with NO Exchange and NO
      // per-query Sort on either side (plan-pinned in PlanShapeSpec). This
      // is the discharge of the §2a note "with bucketed tables they'd
      // become zero-shuffle": at 100 TB you pay the shuffle once at write
      // time and amortize it over every downstream join/agg on that key.
      // Tables are (re)written once per session per sfDir (content is
      // static test data); real pipelines maintain them incrementally.
      val (lt, ot) = Relational.ensureBucketedTables(s, d)
      s.table(lt).hint("merge")
        .join(s.table(ot), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          Q.moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("o_orderpriority"))
    }))

  /** DuckDB-dialect oracles (run by the driver against the same tables). */
  val oracleSql: Map[String, String] = Map(
    "scan_pruned_date" ->
      """SELECT event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(CAST(ts AS TIMESTAMP) AS DATE) = DATE '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "join_range_binned" ->
      """SELECT o_orderkey, COUNT(*) AS n_shipped
        |FROM orders o JOIN lineitem l
        |  ON l.l_shipdate >= CAST(o.o_orderdate AS TIMESTAMP)
        | AND l.l_shipdate < CAST(o.o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)
        |WHERE o.o_totalprice > 400000
        |  AND o.o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-01-31'
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | l_extendedprice * (1 - l_discount) AS net_price
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_quantity, net_price""".stripMargin,

    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_quantity IN (10, 20, 30, 40)
        |  AND (l_returnflag = 'A' OR l_discount BETWEEN 0.05 AND 0.07)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  l_discount""".stripMargin,

    "filter_null_case" ->
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS okey,
        | CASE WHEN o_totalprice IS NULL THEN 'none'
        |      WHEN o_totalprice > 300000 THEN 'big'
        |      ELSE 'small' END AS bucket,
        | COALESCE(o_totalprice, 0.0) AS val
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, okey""".stripMargin,

    "join_inner" ->
      """SELECT l_orderkey, l_linenumber, o_custkey, o_orderstatus, l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |ORDER BY l_orderkey, l_linenumber, o_custkey, o_orderstatus,
        |  l_extendedprice""".stripMargin,

    "join_broadcast" ->
      """SELECT r_name, n_name, COUNT(*) AS n_cust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "join_sortmerge" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_theta_range" ->
      """SELECT s_suppkey, COUNT(*) AS n_parts,
        | CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM supplier JOIN part
        |  ON s_acctbal >= p_retailprice - 500 AND s_acctbal <= p_retailprice + 500
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,

    "join_time_range" ->
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events)
        |SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
        | EPOCH_US(b.ts) // 1000000 - EPOCH_US(a.ts) // 1000000 AS gap_sec
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id AND a.event_id < b.event_id
        |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |ORDER BY a.user_id, event_a, event_b""".stripMargin,

    "join_asof" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |SELECT event_id, user_id, ts, signup_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    LAST_VALUE(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_ts
        |  FROM e) t
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "join_null_safe" ->
      """WITH a AS (SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS pri
        |           FROM orders),
        | b AS (SELECT DISTINCT pri FROM a)
        |SELECT COALESCE(a.pri, '<null>') AS pri_key, COUNT(*) AS n_orders
        |FROM a JOIN b ON a.pri IS NOT DISTINCT FROM b.pri
        |GROUP BY 1 ORDER BY pri_key""".stripMargin,

    "join_asof_fwd" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
        |  FROM events WHERE event_type IN ('signup', 'purchase'))
        |SELECT event_id, user_id, ts, purchase_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    FIRST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS purchase_ts
        |  FROM e) t
        |WHERE event_type = 'signup' ORDER BY event_id""".stripMargin,

    "join_full" ->
      """WITH rich AS (SELECT c_custkey, c_acctbal FROM customer
        |              WHERE c_acctbal > 9000),
        |big AS (SELECT o_custkey, COUNT(*) AS n_big FROM orders
        |        WHERE o_totalprice > 450000 GROUP BY o_custkey)
        |SELECT COALESCE(c_custkey, o_custkey) AS custkey,
        | CASE WHEN c_custkey IS NULL THEN 'order_only'
        |      WHEN o_custkey IS NULL THEN 'customer_only'
        |      ELSE 'both' END AS side,
        | COALESCE(c_acctbal, 0.0) AS acctbal,
        | COALESCE(n_big, 0) AS n_big
        |FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,

    // Salting is value-invariant: the oracle is the PLAIN join — the test
    // proves the salted plan computes exactly what the unsalted one does.
    "join_salted" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // Bucketing is storage-layout-invariant: the oracle reads the flat
    // parquet and must hash-match the bucketed-table join.
    "join_bucketed" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        | CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |   AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
