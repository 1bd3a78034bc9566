package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * MinHash band-geometry sweep (VERDICT r4 item 7): measures, for each
 * band count b dividing MinHashK=60, the three numbers the banding
 * trade actually moves —
 *
 *   - candidate pairs (the frame the verify stage must pay for),
 *   - recall vs the exact j ≥ 0.95 truth (candidate ∩ truth / truth),
 *   - wall seconds of the FULL minhash_lsh (candidates + verify),
 *
 * on any corpus directory with a documents table (sf0.1 and the stress
 * corpus scales). The theory curve P(candidate | j) = 1−(1−j^(60/b))^b
 * says more bands = higher recall AND more candidates; what theory
 * can't say is where the verify cost crosses the recall benefit on a
 * REAL corpus — that's this sweep. Results land as a table in the
 * [[graft.llm.Dedup.LshBands]] Scaladoc; the conf knob
 * `spark.graft.minhash.bands` stays the per-corpus override.
 *
 * Usage: runMain graft.BandSweep <dir> [<dir> ...]
 */
object BandSweep {

  val bandCounts: Seq[Int] = Seq(4, 5, 6, 10)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandSweep <documents-dir> [...]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bandsweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(Q.BroadcastSideThresholdKey, "8000000")
    spark.conf.set(Q.BroadcastSideMaxBytesKey, (256L * 1024 * 1024).toString)

    val out = new StringBuilder
    for (dir <- args) {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      val nDocs = docs.count()
      // Exact truth once per corpus (prefix-filter exact arm — feasible
      // at sweep scales; the sweep measures the LSH arm against it).
      val truth = llm.Dedup.exactJaccardPairs(docs, 0.95)
        .select(col("doc_a"), col("doc_b")).persist()
      val nTruth = truth.count()
      println(s"[sweep] $dir docs=$nDocs truth_pairs=$nTruth")
      for (b <- bandCounts) {
        spark.conf.set(llm.Dedup.LshBandsKey, b.toString)
        val t0 = System.nanoTime()
        val nCand = llm.Dedup.lshCandidates(docs).count()
        val tCand = (System.nanoTime() - t0) / 1e9
        val hit = llm.Dedup.lshCandidates(docs)
          .join(truth, Seq("doc_a", "doc_b"), "left_semi").count()
        val recall = if (nTruth == 0) Double.NaN else hit.toDouble / nTruth
        val t1 = System.nanoTime()
        val nOut = llm.Dedup.minhashLsh(docs, 0.95).groupBy().count().head().getLong(0)
        val tFull = (System.nanoTime() - t1) / 1e9
        spark.catalog.clearCache()
        truth.persist() // clearCache unpersists everything; re-pin truth
        truth.count()
        System.gc()
        val line = f"[sweep] $dir b=$b%-3d rows/band=${60 / b}%-3d " +
          f"cand=$nCand%-9d cand_sec=$tCand%6.2f recall=$recall%6.4f " +
          f"lsh_out=$nOut%-8d full_sec=$tFull%6.2f"
        println(line)
        out.append(line).append('\n')
      }
      truth.unpersist()
      spark.conf.unset(llm.Dedup.LshBandsKey)
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("band_sweep.txt"), out.toString)
    catch { case e: Throwable => System.err.println(s"[sweep] write failed: $e") }
    spark.stop()
  }
}
