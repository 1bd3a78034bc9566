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
