package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips (parquet, orc, avro, csv, json, xml) and
  * partition-pruned reads over the events table. */
class IoSpec extends SparkSpec {

  private lazy val base = Files.createTempDirectory("graft_io").toString

  private def fingerprint(df: org.apache.spark.sql.DataFrame) =
    df.agg(
      count(lit(1)), sum(col("event_id")),
      max(col("ts")).cast("string"),
      round(sum(col("value").cast("decimal(18,4)")).cast("double"), 4))
      .head.toSeq

  test("events round-trip through parquet, orc, avro, csv, json, xml") {
    val src = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val want = fingerprint(src)
    for (fmt <- Seq("parquet", "orc", "avro", "csv", "json", "xml")) {
      val path = s"$base/events_$fmt"
      Formats.write(src, path, fmt)
      val back = Formats.read(spark, path, fmt,
        if (Set("csv", "json", "xml")(fmt)) Some(src.schema) else None)
      assert(fingerprint(back) === want, s"round-trip mismatch for $fmt")
    }
  }

  test("graft-range DSv2 source: short-name lookup, exact rows, slice-parallel partitions") {
    val df = spark.read.format("graft-range")
      .option("start", "100").option("end", "1100").option("slices", "5")
      .load()
    assert(df.schema.fieldNames.toSeq === Seq("id", "id_squared", "gauss"))
    assert(df.count() === 1000)
    // slices become real input partitions — the parallel-read contract
    assert(df.rdd.getNumPartitions === 5)
    val agg = df.agg(
        min(col("id")), max(col("id")), sum(col("id")),
        min(col("gauss")), max(col("gauss"))).head
    assert(agg.getLong(0) === 100L && agg.getLong(1) === 1099L)
    assert(agg.getLong(2) === (100L to 1099L).sum)
    assert(agg.getDouble(3) >= 0.0 && agg.getDouble(4) < 1.0)
    // deterministic: two reads agree row-for-row
    val again = spark.read.format("graft-range")
      .option("start", "100").option("end", "1100").option("slices", "3")
      .load()
    assert(df.exceptAll(again).count() === 0)
  }

  test("graft-range DSv2 source: column pruning reaches the connector (pruned ReadSchema, values intact)") {
    val df = spark.read.format("graft-range")
      .option("start", "0").option("end", "1000").option("slices", "4")
      .load()
    val pruned = df.select(col("id_squared"))
    // DSv2 prints the scan's (pruned) output on the BatchScan node
    val plan = pruned.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("id_squared") && !scanLine.contains("gauss"),
      s"pruning did not reach the scan: $scanLine")
    // values survive the pruned read path (reader computes by column name)
    val s = pruned.agg(sum(col("id_squared"))).head.getLong(0)
    assert(s === (0L until 1000L).map(i => i * i).sum)
    // a pruned single-column read of gauss still lands in [0, 1)
    val g = df.select(col("gauss")).agg(max(col("gauss"))).head.getDouble(0)
    assert(g < 1.0 && g >= 0.0)
  }

  test("run metrics listener: a shuffling query reports stages and non-zero shuffle bytes") {
    val listener = new RunMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
      listener.snapshotAndReset()
      // groupBy forces a shuffle; count() forces execution
      Tables.lineitem(spark, sf0001)
        .groupBy(col("l_partkey")).agg(sum(col("l_quantity"))).count()
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
      val m = listener.snapshotAndReset()
      assert(m.stages >= 2, s"expected map+reduce stages, got ${m.stages}")
      assert(m.shuffleWriteBytes > 0, "groupBy produced no shuffle write bytes")
      assert(m.shuffleReadBytes > 0, "groupBy produced no shuffle read bytes")
      assert(m.peakExecutionMemory > 0)
      // counters reset after snapshot
      val empty = listener.snapshotAndReset()
      assert(empty.stages === 0 && empty.shuffleWriteBytes === 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("partitioned write + partition-pruned read") {
    val src = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val path = s"$base/events_part"
    Formats.write(src, path, "parquet", partitionBy = Seq("event_type"))
    val clicks = Formats.read(spark, path, "parquet")
      .filter(col("event_type") === "click")
    // pruning reaches the scan: the partition filter shows up as a
    // PartitionFilters entry, not a post-scan Filter
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      plan.linesIterator.take(8).mkString("\n"))
    assert(clicks.count() ===
      src.filter(col("event_type") === "click").count())
  }
}
