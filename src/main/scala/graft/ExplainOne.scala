package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan-capture harness for the optimization rounds: writes the
 * `.explain("formatted")` output of registry queries — and, after a
 * checksum-forced execution, the AQE-final executed plan — to files,
 * so before/after plan evidence (Exchange counts, join strategies,
 * PushedFilters/ReadSchema) can be committed under plans/rNN/ and
 * checked against the code by a reader who cannot run Spark.
 *
 * Usage: runMain graft.ExplainOne <sfDir> <outDir> <suffix> <query>...
 *          [--no-analyze] [-c key=value ...]
 *
 * Writes <outDir>/<query>_<suffix>.txt per query. Session shape matches
 * Bench/TimeOne exactly (local[32], 32 shuffle partitions, catalog
 * ANALYZE first, broadcast gates pinned) so the captured plan is the
 * one the benchmark actually runs. Per-query cache/checkpoint hygiene
 * follows the Bench runner (clearCache + drainCheckpoints between
 * queries) so one query's caches never shape the next query's plan.
 */
object ExplainOne {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainOne <sfDir> <outDir> <suffix> <query>... " +
        "[--no-analyze] [-c k=v ...]")
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val noAnalyze = args.contains("--no-analyze")
    val confs = args.zipWithIndex.collect {
      case ("-c", i) if i + 1 < args.length => args(i + 1) }
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val confArgs = args.zipWithIndex.collect {
      case ("-c", i) if i + 1 < args.length => args(i + 1) }.toSet
    val queries = args.drop(3).filterNot(a =>
      a.startsWith("--") || a == "-c" || confArgs.contains(a))
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    queries.foreach { query =>
      val df = SparkEntry.queries(query)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      // Checksum-forced execution (Bench's methodology) so the executed
      // plan below is the AQE-FINAL one, not the pre-adaptive guess.
      val agg = df.agg(count(lit(1)).as("n"),
        sum(xxhash64(struct(df.columns.map(col): _*)).cast("double")).as("chk"))
      agg.collect()
      val executed = agg.queryExecution.executedPlan.toString
      val exchanges = "Exchange".r.findAllIn(executed).length
      val body =
        s"== query: $query  sf: $sfDir ==\n" +
        s"== session: local[32], shuffle.partitions=32, ANALYZE=${!noAnalyze}" +
        (if (confs.nonEmpty) s", confs: ${confs.map { case (k, v) => s"$k=$v" }
          .mkString(", ")}" else "") + " ==\n\n" +
        "== RESULT FRAME explain(formatted) ==\n" + formatted +
        "\n\n== EXECUTED (AQE-final) plan of the checksum aggregate ==\n" +
        s"== executed-plan Exchange mentions: $exchanges ==\n" + executed + "\n"
      val outPath = java.nio.file.Paths.get(outDir, s"${query}_$suffix.txt")
      java.nio.file.Files.writeString(outPath, body)
      println(s"[explainone] wrote $outPath (${body.length} chars)")
      spark.catalog.clearCache()
      Q.drainCheckpoints(spark)
      System.gc()
    }
    spark.stop()
  }
}
