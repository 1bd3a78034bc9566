package graft

import org.apache.spark.sql.functions._

/** Hand-computed expectations on tiny literal frames + sf0.001 sanity
  * (SURVEY.md §5.2). The DuckDB oracle (tools/preflight.py) is the primary
  * gate; these pin semantics independently of DuckDB. */
class OperatorSpec extends SparkSpec {

  test("agg_group: Q1 shape on a 6-row literal lineitem") {
    val s = spark
    import s.implicits._
    val li = Seq(
      ("A", "F", 10.0, 100.0, 0.10),
      ("A", "F", 20.0, 200.0, 0.00),
      ("N", "O", 5.0, 50.0, 0.50),
      ("N", "O", 5.0, 50.0, 0.50),
      ("R", "F", 1.0, 10.0, 0.00),
      ("R", "F", 3.0, 30.0, 0.00)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")
    val out = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(Q.moneySum($"l_quantity").as("sum_qty"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_disc_price"))
      .orderBy($"l_returnflag")
      .collect()
    assert(out.map(r => (r.getString(0), r.getDouble(3))).toSeq ===
      Seq(("A", 290.0), ("N", 50.0), ("R", 40.0)))
    assert(out.map(_.getDouble(2)).toSeq === Seq(30.0, 10.0, 4.0))
  }

  test("join_asof: purchase pairs with most recent prior signup") {
    val s = spark
    import s.implicits._
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(sec * 1000)
    // user 1: signup@10, purchase@20 (→10), signup@30, purchase@40 (→30)
    // user 2: purchase@5 (→ null)
    val e = Seq(
      (1L, 1L, ts(10), "signup"), (2L, 1L, ts(20), "purchase"),
      (3L, 1L, ts(30), "signup"), (4L, 1L, ts(40), "purchase"),
      (5L, 2L, ts(5), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Long.MinValue, 0)
    val out = e.withColumn("signup_ts",
        last(when($"event_type" === "signup", $"ts"), ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id", $"signup_ts").orderBy($"event_id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.getTime / 1000))).toSeq ===
      Seq((2L, Some(10L)), (4L, Some(30L)), (5L, None)))
  }

  test("window_running: final row of each group equals the group sum (sf0.001)") {
    val out = operators.Windows.queries("window_running")(spark, sf0001)
    val s = spark
    import s.implicits._
    val last = out.groupBy($"o_custkey")
      .agg(max($"running_total").as("final_total"))
    val direct = Tables.orders(spark, sf0001).groupBy($"o_custkey")
      .agg(Q.moneySum($"o_totalprice").as("direct_total"))
    val joined = last.join(direct, "o_custkey")
      .filter(abs($"final_total" - $"direct_total") > 1e-9)
    assert(joined.count() === 0)
  }

  test("set ops algebra: intersect + except partition the left slice (sf0.001)") {
    val inter = operators.SetOps.queries("set_intersect")(spark, sf0001).count()
    val exc = operators.SetOps.queries("set_except")(spark, sf0001).count()
    val s = spark
    import s.implicits._
    val left = Tables.orders(spark, sf0001)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey").distinct().count()
    assert(inter + exc === left)
  }

  test("agg_approx_distinct within 5% of exact (sf0.001)") {
    val s = spark
    import s.implicits._
    val approx = operators.Aggregates.queries("agg_approx_distinct")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf0001)
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx=$ap exact=$ex")
    }
  }

  test("agg_hll_partitioned: union of monthly sketches == one flat sketch, estimate within 5% (sf0.001)") {
    val s = spark
    import s.implicits._
    val out = operators.Aggregates.queries("agg_hll_partitioned")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    // estimate within 5% of exact per group (err_bp carries it exactly)
    out.foreach { case (k, (_, ap, ex, errBp)) =>
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$k: approx=$ap exact=$ex")
      assert(errBp === math.abs(ap - ex) * 10000L / ex)
    }
    // MERGEABILITY: the union of per-month sketch states estimates what
    // a single flat sketch over the same rows estimates — the property
    // that lets a 100 TB rollup run sketch-side only. REGISTER merge is
    // exact, the ESTIMATE is not: past the coupon-list threshold
    // Datasketches switches a unioned sketch from the HIP estimator to
    // the composite one, so the two estimates legitimately diverge
    // within the sketch's own error band — assert ≤ 2% relative, not
    // equality (at this fixture's ~130 distinct/group both are still in
    // exact coupon mode and the diff is 0).
    val flat = Tables.orders(spark, sf0001)
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.expr(
        "hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { case (k, (nParts, ap, _, _)) =>
      assert(nParts > 1, s"$k: only $nParts partials — merge not exercised")
      assert(math.abs(flat(k) - ap).toDouble / flat(k) <= 0.02,
        s"$k: union estimate $ap vs flat sketch ${flat(k)} diverges > 2%")
    }
  }

  test("fn_map: element_at round-trips the constructed map (sf0.001)") {
    val out = functions.ScalarFns.queries("fn_map")(spark, sf0001)
    val s = spark
    import s.implicits._
    assert(out.filter($"n_keys" =!= 2L).count() === 0)
    assert(out.filter($"m_k".isNull || $"m_type".isNull).count() === 0)
  }

  test("stream_dedup is idempotent (sf0.001)") {
    val once = streaming.EventOps.queries("stream_dedup")(spark, sf0001)
    assert(once.count() === once.dropDuplicates("event_id").count())
  }

  test("upsert_latest is the true last-write-wins state (recomputed from raw events, sf0.001)") {
    val out = streaming.EventOps.queries("upsert_latest")(spark, sf0001)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    val want = Tables.events(spark, sf0001)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(out === want)
    assert(out.size === Tables.events(spark, sf0001)
      .select("user_id").distinct().count())
  }

  test("event_rfm frequencies sum to the total event count (sf0.001)") {
    val rfm = streaming.EventOps.queries("event_rfm")(spark, sf0001)
    assert(rfm.agg(sum(col("frequency"))).head.getLong(0) ===
      Tables.events(spark, sf0001).count())
    // monetary only counts purchases
    val mon = rfm.agg(sum(col("monetary"))).head.getDouble(0)
    val purch = Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase")
      .agg(Q.moneySum(col("value"))).head.getDouble(0)
    assert(math.abs(mon - purch) < 1e-6)
  }

  test("event_ewma matches a driver-side fold for the busiest user (sf0.001)") {
    val out = streaming.EventOps.queries("event_ewma")(spark, sf0001)
    val top = Tables.events(spark, sf0001).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc, col("user_id"))
      .head.getAs[Long]("user_id")
    val vals = Tables.events(spark, sf0001)
      .filter(col("user_id") === top)
      .orderBy(col("ts"), col("event_id"))
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    var st = Double.NaN
    val want = vals.map { case (eid, v) =>
      st = if (st.isNaN) v else 0.5 * v + 0.5 * st
      eid -> math.floor(st * 10000 + 0.5).toLong
    }.toMap
    val got = out.filter(col("user_id") === top).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("ewma_bp")).toMap
    assert(got === want)
  }

  test("event_ewma hot key: a planted 200k-event user completes in one task and matches a local fold") {
    // The batch twin collects one key's whole timeline into one task —
    // the VERDICT r4 item-4 bound. 200k events ≈ 10 MB of task state and
    // an O(n) prefix fold (the quadratic Catalyst array-append spelling
    // would be ~2e10 element copies here and never finish); a key hotter
    // than task memory belongs to the statefulEwma scale arm.
    val n = 200000
    val events = spark.range(n).select(
      expr("timestamp_micros(1704067200000000 + id * 1000000)").as("ts"),
      col("id").as("event_id"),
      lit(7L).as("user_id"),
      (col("id") % 100).cast("double").as("value"))
    val out = streaming.EventOps.ewmaBatch(events)
    assert(out.count() === n)
    val gotLast = out.orderBy(col("event_id").desc).limit(1)
      .head.getAs[Long]("ewma_bp")
    var st = Double.NaN
    (0 until n).foreach { i =>
      val v = (i % 100).toDouble
      st = if (st.isNaN) v else 0.5 * v + 0.5 * st
    }
    assert(gotLast === math.floor(st * 10000 + 0.5).toLong,
      "hot-key tail diverged from the local fold")
  }

  test("cdc_snapshot_diff: updates really changed, inserts really absent at the cutoff (sf0.001)") {
    val out = streaming.EventOps.queries("cdc_snapshot_diff")(spark, sf0001)
    assert(out.filter(col("change") === "update" &&
      col("new_event_id") === col("old_event_id")).count() === 0)
    val oldUsers = Tables.events(spark, sf0001)
      .filter(col("ts") < lit("2024-01-16").cast("timestamp"))
      .select(col("user_id")).distinct()
    assert(out.filter(col("change") === "insert")
      .join(oldUsers, "user_id").count() === 0,
      "an 'insert' user already existed in the old snapshot")
    assert(out.filter(col("change") === "update")
      .join(oldUsers, Seq("user_id"), "left_anti").count() === 0,
      "an 'update' user was missing from the old snapshot")
  }

  test("event_anomaly: all flagged rows really are >= 2.5 sample sds from the user mean (sf0.001)") {
    val out = streaming.EventOps.queries("event_anomaly")(spark, sf0001)
    assert(out.filter(abs(col("z")) < 2.5).count() === 0)
    // spot-check one flagged row against driver-side stats
    out.collect().headOption.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val stats = Tables.events(spark, sf0001).filter(col("user_id") === uid)
        .agg(avg(col("value")), stddev_samp(col("value"))).head
      val z = (r.getAs[Double]("value") - stats.getDouble(0)) / stats.getDouble(1)
      assert(math.abs(math.round(z * 10000) / 10000.0 - r.getAs[Double]("z")) < 1e-9)
    }
  }

  test("scan_dsv2_range aggregates match the closed form over multiples of 7 below 100000") {
    val out = sources.SourceOps.queries("scan_dsv2_range")(spark, sf0001).collect()
    val mults = 0L.until(100000L, 7L)
    assert(out.map(_.getAs[Long]("n")).sum === mults.size)
    assert(out.map(_.getAs[Long]("sum_id")).sum === mults.sum)
    assert(out.map(_.getAs[Long]("sum_sq")).sum === mults.map(i => i * i).sum)
  }

  test("agg_regr: intercept = mean_y - slope*mean_x and r2 in [0,1] (sf0.001)") {
    val out = operators.Aggregates.queries("agg_regr")(spark, sf0001)
    val means = Tables.lineitem(spark, sf0001).groupBy(col("l_returnflag"))
      .agg(avg(col("l_extendedprice")).as("my"), avg(col("l_quantity")).as("mx"))
    out.join(means, "l_returnflag").collect().foreach { r =>
      val want = r.getAs[Double]("my") - r.getAs[Double]("slope") * r.getAs[Double]("mx")
      assert(math.abs(r.getAs[Double]("intercept") - want) < 0.01,
        s"${r.getAs[String]("l_returnflag")}: intercept ${r.getAs[Double]("intercept")} vs $want")
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0 && r2 <= 1)
    }
  }

  test("window_value_fns: first/last/nth agree with per-group max/min/rank-2 (sf0.001)") {
    val out = operators.Windows.queries("window_value_fns")(spark, sf0001)
    val bad = out.groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("mx"), min(col("o_totalprice")).as("mn"),
        first(col("top_price")).as("top"), first(col("bottom_price")).as("bot"))
      .filter(col("mx") =!= col("top") || col("mn") =!= col("bot"))
    assert(bad.count() === 0)
    assert(out.filter(col("second_price") > col("top_price")).count() === 0)
  }

  test("split_train_holdout is deterministic and roughly 90/10 (sf0.001)") {
    val a = operators.Profiling.queries("split_train_holdout")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = operators.Profiling.queries("split_train_holdout")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a === b, "split assignment not deterministic")
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac far from 0.9")
  }

  test("oracle-declared queries emit only comparator-safe schemas (scalar types, unique column names)") {
    import org.apache.spark.sql.types.{ArrayType, BinaryType, MapType, StructType}
    // the driver's DuckDB comparator sorts columns BY NAME and cannot
    // hash array/map/binary cells (SURVEY §7d rule 4) — violating either
    // turns a correct query into a red CORRECTNESS row
    SparkEntry.queries
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .foreach { case (name, fn) =>
        val schema = fn(spark, sf0001).schema
        assert(schema.map(_.name).distinct.size === schema.size,
          s"$name has duplicate output column names")
        schema.foreach { f =>
          val bad = f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] || f.dataType == BinaryType
          assert(!bad, s"$name.${f.name} has comparator-unsafe type ${f.dataType}")
        }
      }
  }

  test("every declared query returns rows at sf0.001 (except join variants that may be empty)") {
    val allowEmpty = Set.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0 || allowEmpty(name), s"$name returned 0 rows at sf0.001")
    }
  }
}
