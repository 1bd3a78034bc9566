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
        "text_bm25", "graph_components_copurchase")
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
}
