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
    // (a') the PRE-r17 round spelling, reconstructed VERBATIM from git
    // history (commit 8f0c024: groupBy(src,dst) then window(src) — two
    // exchanges — on both the adjacency and the candidate pool) so the
    // committed before/after plan pair shows the exchange sharing.
    if (suffix == "before") {
      import org.apache.spark.sql.expressions.Window
      val k = 3
      val wCap = Window.partitionBy(col("src"))
        .orderBy(col("cos_sim").desc, col("dst"))
      val undOld = Q.ownPersist(seed
        .union(seed.select(col("dst").as("src"), col("src").as("dst"),
          col("cos_sim")))
        .groupBy(col("src"), col("dst")).agg(max(col("cos_sim")).as("cos_sim"))
        .withColumn("cr", row_number().over(wCap))
        .filter(col("cr") <= 2 * k)
        .select(col("src"), col("dst")))
      undOld.df.count()
      val candOld = undOld.df.as("x").join(undOld.df.as("y"),
          col("x.dst") === col("y.src"))
        .select(col("x.src").as("src"), col("y.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
        .union(undOld.df)
        .union(seed.select(col("src"), col("dst")))
        .distinct()
      val sidesA = Q.maybeBroadcast(eOwned.df.select(col("vec_id").as("src"),
        col("embedding").as("ea"), col("sq").as("sqa")))
      val sidesB = Q.maybeBroadcast(eOwned.df.select(col("vec_id").as("dst"),
        col("embedding").as("eb"), col("sq").as("sqb")))
      val scoredOld = candOld.join(sidesA, Seq("src")).join(sidesB, Seq("dst"))
        .select(col("src"), col("dst"),
          llm.Similarity.cos4Pre(
            graft.plans.VectorExprs.dotF32(col("ea"), col("eb")),
            col("sqa"), col("sqb")).as("cos_sim"))
      val planOld = scoredOld
        .withColumn("rn", row_number().over(wCap).cast("long"))
        .filter(col("rn") <= k)
        .select(col("src"), col("dst"), col("cos_sim"))
      write("refine_round",
        "== PRE-r17 refineRound spelling (reconstructed verbatim from " +
          "commit 8f0c024) over the same checkpointed exact-kNN seed, " +
          "k=3 ==\n" +
          planOld.queryExecution.explainString(
            ExplainMode.fromString("formatted")))
      undOld.release()
    }
    // (b) the co-purchase edge build.
    write("copurchase_edges",
      "== Graph.copurchaseEdges plan ==\n" +
        llm.Graph.copurchaseEdges(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted")))
    // (b') the PRE-r17 co-purchase spelling (distinct then groupBy, two
    // exchanges), reconstructed verbatim for the same comparison.
    if (suffix == "before") {
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      val oldEdges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_orderkey").as("ok"),
          col("a.l_partkey").as("doc_a"), col("b.l_partkey").as("doc_b"))
        .distinct()
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
      write("copurchase_edges",
        "== PRE-r17 copurchaseEdges spelling (reconstructed verbatim " +
          "from commit 8f0c024) ==\n" +
          oldEdges.queryExecution.explainString(
            ExplainMode.fromString("formatted")))
    }
    spark.catalog.clearCache()
    Q.drainCheckpoints(spark)
    spark.stop()
  }
}
