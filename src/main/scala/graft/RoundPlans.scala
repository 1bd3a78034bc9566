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
    // (c) r18 (VERDICT r17 #3): the partitioning-preserving checkpoint's
    // effect on ONE fixpoint round, captured at the SCALE shape — the
    // claim forced on (size gate zeroed; at 100 TB it fires on its own)
    // and broadcast joins disabled so the round plans the shuffle joins
    // a cluster-scale frame uses. `after` = shim checkpoint (claimed
    // hash layout), `before` = stock localCheckpoint (UnknownPartitioning
    // leaf). The delta to read: the Exchange above the ITERATED frame's
    // leaf — present in before, absent in after.
    {
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevGate = spark.conf.get(Q.BroadcastSideThresholdKey)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(Q.BroadcastSideThresholdKey, "0")
      spark.conf.set("spark.graft.checkpointClaimMinPartBytes", "0")
      try {
        val sp = spark.conf.get("spark.sql.shuffle.partitions").toInt
        // PageRank round: rank frame (node, outdeg, rank) iterated via
        // contribution join + per-node aggregate + spine attach — the
        // pagerankImpl round body, reconstructed on a small node spine.
        val e = Q.ownPersist(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
          .filter(col("src") < 2000).repartition(col("src")))
        e.df.count()
        val spine = e.df.select(col("src").as("node"))
          .union(e.df.select(col("dst").as("node"))).distinct()
        val outdeg = e.df.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("outdeg"))
        val ranks0 = spine.join(outdeg, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("outdeg"), lit(0L)).as("outdeg"),
            lit(1000000L).as("rank"))
          .repartition(sp, col("node"))
        def roundPlan(ranks: org.apache.spark.sql.DataFrame) = {
          val contribs = ranks.filter(col("outdeg") > 0)
            .join(e.df, col("node") === col("src"))
            .select(col("dst"), expr("rank div outdeg").as("c"))
            .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
          ranks.select(col("node"), col("outdeg"))
            .join(contribs, Seq("node"), "left")
            .select(col("node"), col("outdeg"),
              expr("coalesce(s, 0L)").as("rank"))
        }
        for ((mode, ck) <- Seq(
          ("before", ranks0.localCheckpoint(true)),
          ("after", org.apache.spark.sql.GraftShims
            .localCheckpointKeepPartitioning(ranks0)))) {
          val p = roundPlan(ck)
          p.write.format("noop").mode("overwrite").save()
          write(s"pagerank_round_scale_${mode}_claim",
            s"== one pagerank round over a ${if (mode == "before") "stock"
              else "partitioning-claimed"} checkpointed rank frame — " +
              "broadcast disabled (scale shuffle-join shape), claim size " +
              "gate zeroed ==\n" +
              p.queryExecution.explainString(
                ExplainMode.fromString("formatted")))
          org.apache.spark.sql.GraftShims.unpersistLeafRdd(ck)
        }
        // CC step: label frame iterated via candidate-min agg + left
        // join (the r18 join-form advance over a claimed flat leaf).
        val labels0 = e.df.select(col("src").as("doc"))
          .union(e.df.select(col("dst").as("doc"))).distinct()
          .withColumn("lbl", col("doc"))
          .repartition(sp, col("doc"))
        for ((mode, lck) <- Seq(
          ("before", labels0.localCheckpoint(true)),
          ("after", org.apache.spark.sql.GraftShims
            .localCheckpointKeepPartitioning(labels0)))) {
          val candMin = e.df.join(lck, col("dst") === col("doc"))
            .select(col("src").as("doc"), col("lbl"))
            .groupBy(col("doc")).agg(min(col("lbl")).as("cand"))
          val step = lck.join(candMin.hint("shuffle_hash"), Seq("doc"), "left")
            .select(col("doc"),
              least(col("lbl"), coalesce(col("cand"), col("lbl"))).as("lbl"))
          step.write.format("noop").mode("overwrite").save()
          write(s"cc_step_scale_${mode}_claim",
            s"== one connectedComponents join-form step over a ${if (
              mode == "before") "stock" else "partitioning-claimed"} " +
              "checkpointed label frame — broadcast disabled, claim size " +
              "gate zeroed ==\n" +
              step.queryExecution.explainString(
                ExplainMode.fromString("formatted")))
          org.apache.spark.sql.GraftShims.unpersistLeafRdd(lck)
        }
        e.release()
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        spark.conf.set(Q.BroadcastSideThresholdKey, prevGate)
        spark.conf.unset("spark.graft.checkpointClaimMinPartBytes")
      }
    }
    spark.catalog.clearCache()
    Q.drainCheckpoints(spark)
    spark.stop()
  }
}
