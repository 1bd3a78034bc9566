package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-capture harness for the optimization rounds: writes the
 * `.explain("formatted")` output of one registry query — and, after a
 * checksum-forced execution, the AQE-final executed plan — to a file,
 * so before/after plan evidence (Exchange counts, join strategies,
 * PushedFilters/ReadSchema) can be committed under plans/rNN/ and
 * checked against the code by a reader who cannot run Spark.
 *
 * Usage: runMain graft.ExplainOne <query> <sfDir> <outPath>
 *          [--no-analyze] [-c key=value ...]
 *
 * Session shape matches Bench/TimeOne exactly (local[32], 32 shuffle
 * partitions, catalog ANALYZE first, broadcast gates pinned) so the
 * captured plan is the one the benchmark actually runs.
 */
object ExplainOne {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ExplainOne <query> <sfDir> <outPath> [--no-analyze] [-c k=v ...]")
    val query = args(0)
    val sfDir = args(1)
    val outPath = args(2)
    val noAnalyze = args.contains("--no-analyze")
    val confs = args.zipWithIndex.collect {
      case ("-c", i) if i + 1 < args.length => args(i + 1) }
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-explainone")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(Q.BroadcastSideThresholdKey, "8000000")
    spark.conf.set(Q.BroadcastSideMaxBytesKey, (256L * 1024 * 1024).toString)
    if (!noAnalyze) sources.CatalogStats.registerAndAnalyze(spark, sfDir)
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val df = SparkEntry.queries(query)(spark, sfDir)
    val formatted = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    // Checksum-forced execution (Bench's methodology) so the executed
    // plan below is the AQE-FINAL one, not the pre-adaptive guess.
    val agg = df.agg(count(lit(1)).as("n"),
      sum(xxhash64(struct(df.columns.map(col): _*)).cast("double")).as("chk"))
    agg.collect()
    val executed = agg.queryExecution.executedPlan.toString
    val exchanges = "(?m)^.*Exchange".r.findAllIn(executed).length
    val body =
      s"== query: $query  sf: $sfDir ==\n" +
      s"== session: local[32], shuffle.partitions=32, ANALYZE=${!noAnalyze}" +
      (if (confs.nonEmpty) s", confs: ${confs.map { case (k, v) => s"$k=$v" }
        .mkString(", ")}" else "") + " ==\n\n" +
      "== RESULT FRAME explain(formatted) ==\n" + formatted +
      "\n\n== EXECUTED (AQE-final) plan of the checksum aggregate ==\n" +
      s"== executed-plan Exchange count: $exchanges ==\n" + executed + "\n"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outPath).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), body)
    println(s"[explainone] wrote $outPath (${body.length} chars, " +
      s"$exchanges executed-plan Exchanges)")
    spark.catalog.clearCache()
    Q.drainCheckpoints(spark)
    spark.stop()
  }
}
