package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/**
 * Plan capture for FIXPOINT INTERNALS (r17 optimization round): the
 * registry-level explains (graft.ExplainOne) root at the fixpoints'
 * final localCheckpoint leaf, so per-round plan shapes — where the r17
 * exchange-sharing edits live — are invisible there. This harness
 * explains the round-internal frames directly:
 *
 *  - one NN-descent round plan (Similarity.refineRoundPlan) over an
 *    exact-kNN seed — shows the repartition(src)-shared dedup+rank
 *    exchanges;
 *  - the co-purchase edge build (Graph.copurchaseEdges) — shows the
 *    repartition(doc_a, doc_b)-shared distinct+weight-agg exchange.
 *
 * Usage: runMain graft.RoundPlans <sfDir> <outDir> <suffix>
 */
object RoundPlans {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: RoundPlans <sfDir> <outDir> <suffix>")
    val (sfDir, outDir, suffix) = (args(0), args(1), args(2))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-roundplans")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(Q.BroadcastSideThresholdKey, "8000000")
    spark.conf.set(Q.BroadcastSideMaxBytesKey, (256L * 1024 * 1024).toString)
    sources.CatalogStats.registerAndAnalyze(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def write(name: String, body: String): Unit = {
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.writeString(p, body)
      println(s"[roundplans] wrote $p (${body.length} chars)")
    }
    // (a) one NN-descent round over an exact-kNN seed (k = 3, the
    // registry geometry); the seed is checkpointed exactly as the NND
    // loop holds its edge frame between rounds.
    val emb = Tables.embeddings(spark, sfDir)
    val eOwned = Q.ownPersist(llm.Similarity.refineEmbFrame(emb))
    eOwned.df.count()
    val seed = llm.Similarity.knnGraph(emb, 3)
      .select(col("src"), col("dst"), col("cos_sim"))
      .localCheckpoint(true)
    val (roundPlan, und) = llm.Similarity.refineRoundPlan(
      eOwned, Q.Owned(seed, owned = false), 3)
    write("refine_round",
      "== one refineRound plan (Similarity.refineRoundPlan) over a " +
        "checkpointed exact-kNN seed, k=3 ==\n" +
        roundPlan.queryExecution.explainString(
          ExplainMode.fromString("formatted")))
    und.release()
    // (b) the co-purchase edge build.
    write("copurchase_edges",
      "== Graph.copurchaseEdges plan ==\n" +
        llm.Graph.copurchaseEdges(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted")))
    spark.catalog.clearCache()
    Q.drainCheckpoints(spark)
    spark.stop()
  }
}
