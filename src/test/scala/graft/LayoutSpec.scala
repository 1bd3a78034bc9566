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
