package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r9, VERDICT r8 item 5): print the ann_pq recall-vs-
  * rerank-width curve against the exact bruteTopK ground truth for a
  * given sf dir — the measurement behind [[graft.llm.Similarity
  * .PqRerankFactor]]'s default and the `ann_pq_recall_w*` rows
  * StressBench commits to BENCH_stress.json.
  *
  *   runMain graft.PqCurve /root/testdata/sf0.01 [k] [w1,w2,...]
  */
object PqCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val widths = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(4, 8, 16, 32, 64))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-pqcurve")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for ((w, r) <- recallCurve(spark, dir, k, widths))
      println(f"[pqcurve] $dir k=$k width=${w}%-3d recall=$r%.4f")
    spark.stop()
  }

  /** (width, recall) per rerank width — recall of ann_pq's top-k id set
    * vs the exact cosine top-k, over the 10 fixture probes. */
  def recallCurve(spark: SparkSession, dir: String, k: Int,
      widths: Seq[Int]): Seq[(Int, Double)] = {
    val exact = llm.Similarity.bruteTopK(spark, dir, k)
      .select(col("probe_id"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    widths.map { w =>
      val approx = llm.Similarity.annPq(spark, dir, k, w)
        .select(col("probe_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (w, (exact & approx).size.toDouble / exact.size)
    }
  }
}
