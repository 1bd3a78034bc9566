package graft

import org.apache.spark.sql.SparkSession

/**
 * Headline benchmark (driver contract): runs a representative query per
 * operator family on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
 * Timings are first-touch inside one warm JVM — the same methodology as
 * BASELINE.md's probe suite, so the 2× envelope compares like-for-like.
 *
 * The near-dup family is represented by `minhash_lsh` (the at-scale
 * path), not the all-pairs exact `dedup_near`, which exists as the
 * sf0.01 oracle stand-in — benchmarking a deliberately quadratic oracle
 * at sf0.1 would measure the wrong algorithm (SURVEY.md §2d scale notes).
 */
object Bench {

  /** Representative spread: scan/filter, agg, joins, window, events,
    * text, vectors — including both baseline perf risks (cosine
    * self-join, window rank). */
  val headline: Seq[String] = Seq(
    "filter_pred", "agg_group", "join_inner", "join_broadcast",
    "window_rank", "topk_per_group", "stream_tumbling", "stream_session",
    "fn_json", "text_wordcount", "text_quality", "dedup_exact",
    "minhash_lsh", "sim_topk", "knn_label", "embed_neardup", "sort_limit",
    "pivot_wide", "subquery_corr")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
