package graft

import org.apache.logging.log4j.LogManager
import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Cache-ownership hygiene (VERDICT r9 #2): re-running any registry
  * query in one session — the exact shape of a test suite, a notebook,
  * or a long-lived service — must NOT re-persist plans the
  * CacheManager already holds. Spark dedups such persists silently, but
  * each one logs `CacheManager: Asked to cache already cached data`,
  * and at 100 TB that warning marks a call site with unclear cache
  * ownership (the r9 sweep logged 33 of them across the CC/semantic/
  * jaccard paths). Every operator-internal persist now goes through
  * [[Q.ownPersist]], which looks the plan up first and records who must
  * release it; this spec pins the warning count at ZERO by capturing
  * the CacheManager logger while the previously-offending families run
  * twice back-to-back with no clearCache between. */
class CacheHygieneSpec extends SparkSpec {

  private class BufferAppender extends AbstractAppender(
      "graft-cache-capture", null, null, false, Property.EMPTY_ARRAY) {
    val messages = new scala.collection.mutable.ArrayBuffer[String]()
    override def append(e: LogEvent): Unit = synchronized {
      messages += e.getMessage.getFormattedMessage
    }
  }

  test("repeated CC/semantic/jaccard queries never double-persist (zero CacheManager warnings)") {
    val logger = LogManager
      .getLogger("org.apache.spark.sql.execution.CacheManager")
      .asInstanceOf[CoreLogger]
    val appender = new BufferAppender
    appender.start()
    logger.addAppender(appender)
    try {
      spark.catalog.clearCache()
      // The r9 offenders: every family whose operators persist shared
      // subtrees. Two consecutive runs — the second is the one that
      // used to re-persist identical plans.
      val fams = Seq("dedup_near", "dedup_components", "pipeline_curate",
        "minhash_lsh", "dedup_semantic", "dedup_semantic_verdict",
        "tokjoin_auto", "text_tfidf", "text_ngram_lm", "curate_dsir",
        "dedup_ngram_cover", "dedup_spantrim", "embed_lshpairs",
        "text_bm25", "graph_components_copurchase",
        "text_search_bm25", "graph_pagerank_copurchase",
        // r15 rows — all three persist shared subtrees via ownPersist
        // (pair fan / pivot-distance ranking)
        "graph_ppr_weighted", "graph_bfs_seeds", "ann_ivf_verdict",
        // r16 verdict arms — token/sketch/code frames shared across the
        // band joins and the verification join, all via ownPersist
        "minhash_lsh_verdict", "simhash_pairs_verdict",
        "embed_lshpairs_verdict")
      for (_ <- 1 to 2; q <- fams)
        SparkEntry.queries(q)(spark, sf0001).collect()
      val bad = appender.messages.filter(_.contains("already cached"))
      assert(bad.isEmpty,
        s"${bad.size} double-persist warning(s) from CacheManager — " +
          "an operator persisted a plan someone else already cached")
    } finally {
      logger.removeAppender(appender)
      appender.stop()
      spark.catalog.clearCache()
    }
  }

  test("fixpoint checkpoints are reaped: inline unpersist-on-supersede + runner drain leave zero persistent RDDs (ADVICE r13)") {
    val s = spark
    import s.implicits._
    // Clean slate: clearCache drops CacheManager entries; the drain
    // reaps any checkpoint frames earlier tests registered.
    s.catalog.clearCache()
    Q.drainCheckpoints(spark)
    val base = s.sparkContext.getPersistentRDDs.size
    // A 64-chain with the jump DISABLED pays ~64 min-label rounds → 8
    // localCheckpoint steps: 7 must be unpersisted inline as their
    // successors materialize, the last registered for the drain.
    val prev = s.conf.getOption(llm.Dedup.CcJumpAfterKey)
    s.conf.set(llm.Dedup.CcJumpAfterKey, Int.MaxValue.toString)
    try {
      val chain = (0 until 64).map(i => (i.toLong, i.toLong + 1))
        .toDF("doc_a", "doc_b")
      llm.Dedup.connectedComponents(chain).collect()
    } finally prev match {
      case Some(v) => s.conf.set(llm.Dedup.CcJumpAfterKey, v)
      case None => s.conf.unset(llm.Dedup.CcJumpAfterKey)
    }
    assert(llm.Dedup.lastCcRounds >= 16, "fixture failed to cross 2 checkpoints")
    // Mid-state: at most base + persisted step frames + ONE live
    // checkpoint — never one per 8 steps. (The final step's persist
    // and the registered checkpoint are the only survivors.)
    val afterRun = s.sparkContext.getPersistentRDDs.size
    assert(afterRun <= base + 3,
      s"checkpoint frames accumulated: $afterRun persistent RDDs " +
        s"(base $base) after a ${llm.Dedup.lastCcRounds}-step fixpoint")
    // Runner boundary: clearCache + drain must return to the baseline
    // IMMEDIATELY. The ledger records RDD ids (ADVICE r15 — the r14
    // weak-ref-to-wrapper design was GC-clearable mid-query, and this
    // test's old gc/sleep retry loop masked exactly that), so the drain
    // is deterministic: no GC, no wait, no ContextCleaner fallback.
    s.catalog.clearCache()
    Q.drainCheckpoints(spark)
    assert(s.sparkContext.getPersistentRDDs.size <= base,
      "the runner-boundary drain left checkpoint blocks behind " +
        "(drain must be deterministic — id-based, not GC-dependent)")
  }
}
