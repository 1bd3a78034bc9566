package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Dev probe (r18): executed-plan diff of one NN-descent round whose
  * seed checkpoint does / does not claim its partitioning — pinpoints
  * where the claim changes the physical plan. Measurement harness only. */
object NndClaimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set(Q.BroadcastSideThresholdKey, "8000000")
    spark.conf.set(Q.BroadcastSideMaxBytesKey, (256L * 1024 * 1024).toString)
    sources.CatalogStats.registerAndAnalyze(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val eOwned = Q.ownPersist(llm.Similarity.refineEmbFrame(emb))
    eOwned.df.count()
    val k = 12
    for (claim <- Seq("false", "true")) {
      spark.conf.set("spark.graft.keepCheckpointPartitioning", claim)
      var edges = org.apache.spark.sql.GraftShims.localCheckpointKeepPartitioning(
        llm.Similarity.knnGraph(emb, 3)
          .select(col("src"), col("dst"), col("cos_sim")))
      for (r <- 1 to 2) {
        val (plan, und) = llm.Similarity.refineRoundPlan(
          eOwned, Q.Owned(edges, owned = false), k)
        val ck = org.apache.spark.sql.GraftShims
          .localCheckpointKeepPartitioning(plan)
        val out = s"/tmp/nnd_claim_${claim}_r$r.txt"
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
          plan.queryExecution.explainString(ExplainMode.fromString("formatted")))
        println(s"[probe] claim=$claim round=$r wrote $out")
        und.release()
        org.apache.spark.sql.GraftShims.unpersistLeafRdd(edges)
        edges = ck
      }
      org.apache.spark.sql.GraftShims.unpersistLeafRdd(edges)
    }
    spark.stop()
  }
}
