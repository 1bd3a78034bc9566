package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into Spark's `private[sql]` Column/Dataset constructors
  * so the engine can expose custom Catalyst expressions as `Column`s and
  * custom `LogicalPlan` nodes as `DataFrame`s (Spark 4 wraps Columns in
  * ColumnNodes; `classic.ExpressionUtils.column` / `classic.Dataset.ofRows`
  * are the supported internal conversions). */
object GraftShims {
  def exprColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Block until every queued listener event is delivered — lets tests
    * count jobs/stages deterministically (the bus is async; a plain
    * listener read races the events it is counting). */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** True when the frame's analyzed plan already has a CacheManager
    * entry (same-result match — the exact check `persist()` itself runs
    * before warning "Asked to cache already cached data"). Lets
    * operator code take cache OWNERSHIP explicitly instead of
    * re-persisting blind: see [[graft.Q.ownPersist]]. */
  def isCached(df: DataFrame): Boolean = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.sparkSession.sharedState.cacheManager.lookupCachedData(ds).isDefined
  }

  /** Unpersist the RDD blocks behind an (eager) `localCheckpoint`-ed
    * frame (ADVICE r13): checkpoint blocks live OUTSIDE the
    * CacheManager, so `spark.catalog.clearCache()` never reaps them —
    * without this, every iterative fixpoint leaks one label/rank frame
    * per checkpoint for the session lifetime. Walks the analyzed plan
    * for `LogicalRDD` leaves and unpersists their RDDs (non-blocking).
    * Caller contract: the frame's data must no longer be needed — a
    * localCheckpoint's lineage is truncated, so a later cache-loss
    * recompute through it would fail (the documented localCheckpoint
    * trade-off; in practice the successor frame is itself materialized
    * before this is called).
    *
    * ADVICE r14: refuses (loudly) any frame that is not a single-leaf
    * checkpoint snapshot. Every call site passes the direct result of
    * `localCheckpoint`/`flattenToLeaf` — exactly one `LogicalRDD` leaf;
    * a derived/joined frame could carry OTHER LogicalRDD leaves over
    * still-cached RDDs, and unpersisting those collaterally causes
    * "block not found" recompute failures with truncated lineage. */
  def unpersistLeafRdd(df: DataFrame): Unit = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val leaves = ds.queryExecution.analyzed.collect {
      case lr: execution.LogicalRDD => lr
    }
    require(leaves.length == 1,
      s"unpersistLeafRdd: expected exactly one LogicalRDD leaf, found " +
        s"${leaves.length} — pass the direct localCheckpoint/flattenToLeaf " +
        s"frame, not a derived plan (collateral unpersist hazard)")
    leaves.head.rdd.unpersist(blocking = false)
  }

  /** The id of the single `LogicalRDD` leaf behind a checkpoint frame —
    * same single-leaf contract (and loud refusal) as [[unpersistLeafRdd]].
    * ADVICE r15: the checkpoint ledger records this small strong int
    * instead of a weak reference to the Dataset WRAPPER — the wrapper is
    * unreachable the moment the query builder returns (derived frames
    * reference only the logical plan), so a GC during execution cleared
    * the ref and the deterministic drain silently degraded to the async
    * ContextCleaner path. An int pins nothing and stays drainable. */
  def leafRddId(df: DataFrame): Int = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val leaves = ds.queryExecution.analyzed.collect {
      case lr: execution.LogicalRDD => lr
    }
    require(leaves.length == 1,
      s"leafRddId: expected exactly one LogicalRDD leaf, found " +
        s"${leaves.length} — pass the direct localCheckpoint/flattenToLeaf " +
        s"frame, not a derived plan")
    leaves.head.rdd.id
  }

  /** Unpersist an RDD by id (non-blocking) — `SparkContext.unpersistRDD`
    * is `private[spark]`, reachable from this package. Removing an id the
    * ContextCleaner already reaped is a harmless no-op, so a ledger drain
    * can never fail on a frame that was GC-reclaimed in the meantime. */
  def unpersistRddId(spark: SparkSession, id: Int): Unit =
    spark.sparkContext.unpersistRDD(id, blocking = false)

  /** Re-root a (typically persisted) frame as a flat `LogicalRDD` leaf —
    * the lineage-truncation half of `Dataset.localCheckpoint` without
    * its extra materialization job: iterative algorithms that reference
    * the previous round's output TWICE per round (join + union) would
    * otherwise double their logical plan every round. The physical RDD
    * is captured AFTER planning, so a persisted input reads its cache;
    * rows are defensively copied exactly as `checkpoint` does (columnar
    * cache scans emit reused row buffers). */
  def flattenToLeaf(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val leaf = execution.LogicalRDD.fromDataset(
      ds.queryExecution.toRdd.map(_.copy()), ds, isStreaming = false)
    classic.Dataset.ofRows(ds.sparkSession, leaf)
  }
}
