package graft

import org.apache.spark.sql.functions._

/** Z-order layout properties (operators/Layout.scala): the bit-fixing
  * argument behind the pruning claim, and the physical write path. */
class LayoutSpec extends SparkSpec {

  test("layout_zorder: every bucket's dimension spans collapse (a <= 63, b <= 31)") {
    // bucket = zval div 2048 fixes z bits 15..11 = (b7, a7, b6, a6, b5):
    // a's top 2 bits and b's top 3 bits are constant inside a bucket, so
    // a_span <= 2^6 - 1 and b_span <= 2^5 - 1 — vs the full 255 either
    // dimension spans in a layout sorted by the OTHER dimension.
    val rows = operators.Layout.queries("layout_zorder")(spark, sf001)
      .select("bucket", "a_span", "b_span").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 63, s"bucket ${r.getLong(0)} a_span ${r.getLong(1)} > 63")
      assert(r.getLong(2) <= 31, s"bucket ${r.getLong(0)} b_span ${r.getLong(2)} > 31")
    }
  }

  test("layout_zorder plans as scan -> project -> hash agg (no window, no global sort before agg)") {
    val p = operators.Layout.queries("layout_zorder")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "bucket assignment must be a projection, not a window")
    assert(p.contains("HashAggregate"))
  }

  test("layout_compact: plan equals the sequential next-fit-decreasing fold; bins land within one part of target") {
    val out = operators.Layout.queries("layout_compact")(spark, sf001).collect()
    assert(out.nonEmpty)
    // replicate the planner as a plain driver-side fold over the part
    // list and demand the identical assignment — the window spelling
    // must BE the sequential algorithm, not an approximation of it
    val parts = out.map(r => (r.getDate(0), r.getLong(1)))
      .sortBy { case (d, n) => (-n, d.toString) }
    val total = parts.map(_._2).sum
    val target = math.max(total / operators.Layout.CompactTargetBins, 1L)
    var cum = 0L
    val expected = parts.map { case (d, n) =>
      val bin = cum / target; cum += n; (d, bin)
    }.toMap
    out.foreach { r =>
      assert(r.getLong(2) === expected(r.getDate(0)),
        s"part ${r.getDate(0)} bin ${r.getLong(2)} != NFD fold") }
    // structural invariants: totals preserved; bin ids contiguous;
    // every non-final bin crossed its boundary, so its total is within
    // one part of the target
    val bins = out.groupBy(_.getLong(2))
    assert(bins.map { case (_, rs) => rs.head.getLong(3) }.sum === total)
    val maxBin = bins.keys.max
    assert(bins.keySet === (0L to maxBin).toSet, "bin ids not contiguous")
    val maxPart = parts.map(_._2).max
    bins.foreach { case (b, rs) =>
      val t = rs.head.getLong(3)
      assert(rs.forall(_.getLong(4) === rs.length.toLong))
      if (b < maxBin)
        assert(t >= target - maxPart + 1 && t < target + maxPart,
          s"bin $b total $t outside (target ± part) band")
    }
  }

  test("compactWrite: one file per planned bin, rows preserved, files hold whole bins") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    try {
      val nBins = operators.Layout.compactWrite(spark, sf0001, dir)
      val back = spark.read.parquet(dir)
      assert(back.count() === Tables.events(spark, sf0001).count())
      val fileBins = back.groupBy(input_file_name().as("f"))
        .agg(countDistinct(col("bin")).as("nb"), min(col("bin")).as("b"))
        .collect()
      assert(fileBins.length === nBins.toInt,
        s"expected $nBins files, got ${fileBins.length}")
      fileBins.foreach(r => assert(r.getLong(1) === 1L,
        s"file ${r.getString(0)} spans ${r.getLong(1)} bins"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("zorderWrite: files carry disjoint z-ranges and preserve all rows") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      val src = Tables.orders(spark, sf0001)
      operators.Layout.zorderWrite(src, "o_custkey % 256",
        "datediff(o_orderdate, DATE '1992-01-01') % 256", dir, 8)
      val back = spark.read.parquet(dir)
      assert(back.count() === src.count())
      val ranges = back
        .groupBy(input_file_name().as("f"))
        .agg(min("zval").as("lo"), max("zval").as("hi"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
      assert(ranges.length > 1, "expected multiple files")
      ranges.sliding(2).foreach {
        case Array((_, hi1), (lo2, _)) =>
          assert(hi1 <= lo2, s"file z-ranges overlap: hi $hi1 > next lo $lo2")
        case _ =>
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
