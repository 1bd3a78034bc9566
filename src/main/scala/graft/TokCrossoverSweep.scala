package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Token-modality exact-vs-LSH crossover sweep (VERDICT r6 item 2): the
 * measurement behind [[graft.plans.SimilarityJoinRewrite.TokThresholdKey]]'s
 * default. The vector crossover (20 k rows) was measured in the r5
 * stress sweep; r6's catalog-stats fix fed TRUE rowCounts into the auto
 * arm and exposed that the token modality's crossover is far lower —
 * a prefix-filtered token-set intersection over ~50–170-token docs
 * costs orders of magnitude more per pair than a 64-float dot product,
 * so the n² knee arrives at far smaller n.
 *
 * Method: deterministic doc_id-ordered prefixes of a real corpus are
 * written to scratch parquet (both arms then read identical plain
 * scans), and each size measures the full wall time of
 * [[graft.llm.Dedup.exactJaccardPairs]] vs [[graft.llm.Dedup.minhashLsh]]
 * at j ≥ 0.95, checksum-forced like Bench (no column pruning deleting
 * unmeasured work), after one untimed warmup pass at the smallest size.
 * The crossover is where the curves intersect; the conf default is set
 * just under it so auto errs toward the arm that always finishes.
 *
 * Usage: runMain graft.TokCrossoverSweep <documents-dir> [sizes...]
 */
object TokCrossoverSweep {

  val defaultSizes: Seq[Int] = Seq(500, 1000, 2000, 3000, 5000)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TokCrossoverSweep <documents-dir> [sizes...]")
    val srcDir = args(0)
    val sizes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else defaultSizes
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-tokcrossover")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(Q.BroadcastSideThresholdKey, "8000000")
    spark.conf.set(Q.BroadcastSideMaxBytesKey, (256L * 1024 * 1024).toString)

    val scratch = java.nio.file.Files.createTempDirectory("tokxover").toString
    val all = Tables.documents(spark, srcDir).select(col("doc_id"), col("text"))
    def subsetPath(n: Int) = s"$scratch/docs_$n"
    sizes.foreach { n =>
      all.orderBy(col("doc_id")).limit(n).coalesce(4)
        .write.mode("overwrite").parquet(subsetPath(n))
    }
    def force(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1)).as("n"),
        sum(xxhash64(struct(df.columns.map(col): _*)).cast("double")).as("chk"))
        .collect()(0).getLong(0)
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = body
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    def docsAt(n: Int) = spark.read.parquet(subsetPath(n))

    // Untimed warmup at the smallest size: JIT, codegen, parquet readers.
    force(llm.Dedup.exactJaccardPairs(docsAt(sizes.min), 0.95))
    force(llm.Dedup.minhashLsh(docsAt(sizes.min), 0.95))

    val out = new StringBuilder
    out.append(s"corpus=$srcDir\n")
    for (n <- sizes) {
      val docs = docsAt(n)
      val (tExact, rowsExact) = timed(force(llm.Dedup.exactJaccardPairs(docs, 0.95)))
      spark.catalog.clearCache(); System.gc()
      val (tLsh, rowsLsh) = timed(force(llm.Dedup.minhashLsh(docs, 0.95)))
      spark.catalog.clearCache(); System.gc()
      val line = f"[tokxover] n=$n%-6d exact=$tExact%7.2f s (pairs=$rowsExact%-7d)  " +
        f"lsh=$tLsh%7.2f s (pairs=$rowsLsh%-7d)"
      println(line)
      out.append(line).append('\n')
    }
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("tok_crossover.txt"), out.toString)
    catch { case e: Throwable => System.err.println(s"[tokxover] write failed: $e") }
    spark.stop()
  }
}
