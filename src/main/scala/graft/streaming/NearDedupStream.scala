package graft.streaming

import graft.Q
import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming near-deduplication — the MinHash-LSH dedup family applied
 * to a document STREAM via a foreachBatch sink with a persistent,
 * bucket-pruned signature store (the 100 TB ingestion shape: documents
 * arrive continuously; each must be judged against everything already
 * seen without rescanning the corpus).
 *
 * Semantics — identical to the batch operator by construction: a
 * document is DROPPED iff some smaller-id document already seen is a
 * verified near-dup of it (banding candidate + signature pre-filter +
 * exact Jaccard ≥ thresh — [[graft.llm.Dedup.verifyPairs]], the same
 * code path [[graft.llm.Dedup.minhashLsh]] runs). The pair relation
 * depends only on document contents and ids, never on batch
 * boundaries, so the stream's verdicts are BIT-PARITY with the batch
 * twin [[graft.llm.Dedup.neardedupVerdicts]] and invariant to how the
 * stream is batched — both asserted in StreamingSpec. The store keeps
 * ALL seen documents (kept and dropped): "earlier near-dup" is defined
 * against everything seen, which is what makes the verdicts
 * batching-invariant (a kept-only store would make a doc's fate depend
 * on whether its dup landed in the same micro-batch).
 *
 * Delivery contract (mirrors upsertBatch's orderCol contract):
 * doc_ids are unique and arrive in monotone non-decreasing order
 * across epochs (an ingest directory of id-ranged files does this
 * naturally). Out of order, verdicts remain CONSISTENT — a doc is only
 * ever dropped in favor of a smaller id it arrived after — but exact
 * parity with the batch twin needs monotone delivery, since an
 * already-written verdict cannot be retracted when a smaller dup
 * arrives late (the fundamental online constraint).
 *
 * Store layout under `target/` — all writes are PER-EPOCH overwrites,
 * so a replayed epoch (crash between data writes and the ledger
 * marker) rewrites its own directories instead of duplicating rows:
 *
 *   bands/epoch=N/_bucket=B/    (band, band_key, doc_id) — the LSH
 *                               band keys of every doc in epoch N,
 *                               bucketed by hash(band, band_key)
 *   payload/epoch=N/_pbucket=B/ (doc_id, sig, toks) — 60-long MinHash
 *                               signature + sorted token-hash array
 *                               (~1 KB/doc; the price of EXACT-verified
 *                               streaming dedup rather than
 *                               estimate-only), bucketed by
 *                               hash(doc_id)
 *   verdicts/epoch=N/           (doc_id, kept, dup_of, jaccard)
 *   _epochs/N                   ledger marker, written LAST
 *
 * Each epoch reads the store twice, both reads partition-pruned: the
 * bands read touches only the ≤ nBuckets band buckets the batch's own
 * keys hash into; the payload read only the doc buckets of actual
 * cross-epoch candidates. Neither read scans the corpus — per-epoch
 * cost is O(batch + candidates), the same class as one batch-operator
 * run over the batch, regardless of how much history the store holds.
 * Like every epoch-directory sink, buckets accumulate O(epochs) files;
 * the compaction chore is [[StreamPipelines.compactUpsertTarget]]'s
 * pattern applied per store (operational note, not implemented twice).
 */
object NearDedupStream {

  /** The foreachBatch function. `thresh` is the exact-Jaccard keep
    * threshold (the batch operator's knob); `nBuckets` sizes both
    * stores' pruning grain. */
  def neardedupBatch(target: String, thresh: Double, nBuckets: Int)
      (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val marker = new Path(new Path(target, "_epochs"), batchId.toString)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return // replayed epoch: already fully applied
    val bandsDir = new Path(target, "bands").toString
    val payloadDir = new Path(target, "payload").toString
    val verdictsDir = new Path(target, "verdicts").toString
    if (batch.isEmpty) { // empty trigger: ledger only
      fs.mkdirs(marker.getParent); fs.create(marker, true).close(); return
    }
    val nBands = Dedup.lshBands(batch)
    val rows = Dedup.MinHashK / nBands
    // One scan computes both per-doc artifacts (signature + sorted
    // token hashes); persisted — it feeds banding, both verify sides,
    // the verdict frame, and the payload write.
    val prep = Q.ownPersist(batch
      .select(col("doc_id"),
        graft.plans.VectorExprs.minhashSig(
          array_distinct(split(col("text"), " ")), Dedup.MinHashK).as("sig"),
        graft.plans.VectorExprs.tokenHashesSorted(
          array_distinct(split(col("text"), " "))).as("toks"))
      .dropDuplicates("doc_id"))
    prep.df.count()
    val sigsB = prep.df.select(col("doc_id"), col("sig"))
    // Band keys in EXACTLY lshCandidatePairs' form (xxhash64 of the
    // band's signature slice) — cross-epoch candidates must be the
    // same relation the within-batch banding finds.
    val bandsB = Q.ownPersist(sigsB
      .select(col("doc_id"), posexplode(array((0 until nBands).map(b =>
        xxhash64(slice(col("sig"), b * rows + 1, rows))): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
      .withColumn("_bucket",
        pmod(xxhash64(col("band"), col("band_key")), lit(nBuckets))
          .cast("int")))
    bandsB.df.count()
    // WITHIN-batch candidates: the batch operator's own banding.
    val candsWithin = Dedup.lshCandidatePairs(sigsB, nBands)
    // CROSS-epoch candidates: batch band keys vs the store, pruned to
    // the band buckets this batch actually touches. doc_a < doc_b keeps
    // the "smaller id wins" total order even if delivery was not
    // monotone (see the delivery contract above).
    // BOTH store halves must exist before the cross-epoch path runs: a
    // crash between the bands write and the payload write on the FIRST
    // data-bearing epoch leaves bands without payload, and a replay
    // that trusted bands alone would read a payload dir that does not
    // exist — a permanent crash loop. Bands-without-payload can only
    // hold the crashed epoch's own rows (the payload dir, once created
    // by any completed epoch, never disappears, and an uncommitted
    // epoch replays with the same batchId), so treating that state as
    // "no past" is bit-correct: the batch's own docs are re-covered by
    // the within-batch banding and the per-epoch overwrite replaces
    // the partial bands data.
    val havePast = fs.exists(new Path(bandsDir)) &&
      fs.exists(new Path(payloadDir))
    val crossPairs =
      if (!havePast) None
      else {
        val touched = bandsB.df.select(col("_bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq // bounded by nBuckets
        Some(spark.read.parquet(bandsDir)
          .filter(col("_bucket").isin(touched: _*)).as("s")
          .join(bandsB.df.as("n"),
            col("s.band") === col("n.band") &&
              col("s.band_key") === col("n.band_key") &&
              col("s.doc_id") < col("n.doc_id"))
          .select(col("s.doc_id").as("doc_a"), col("n.doc_id").as("doc_b"))
          .distinct())
      }
    // Payload rows for the cross-candidates' store side, pruned to the
    // doc buckets that actually hold candidates.
    val (sigsAll, toksAll, crossCands) = crossPairs match {
      case None => (sigsB, prep.df.select(col("doc_id"), col("toks")), None)
      case Some(cp) =>
        val cpOwned = Q.ownPersist(cp)
        val pBuckets = cpOwned.df
          .select(pmod(xxhash64(col("doc_a")), lit(nBuckets)).cast("int")
            .as("_pbucket"))
          .distinct().collect().map(_.getInt(0)).toSeq
        val payload = spark.read.parquet(payloadDir)
          .filter(col("_pbucket").isin(pBuckets: _*))
        (sigsB.unionByName(payload.select(col("doc_id"), col("sig"))),
          prep.df.select(col("doc_id"), col("toks"))
            .unionByName(payload.select(col("doc_id"), col("toks"))),
          Some(cpOwned))
    }
    val cands = crossCands.map(c => candsWithin.union(c.df))
      .getOrElse(candsWithin)
    // The SHARED verification core — bit-parity with minhashLsh.
    val pairs = Dedup.verifyPairs(cands, sigsAll, toksAll, thresh)
    val verdicts = Dedup.verdictsFromPairs(
      prep.df.select(col("doc_id")), pairs)
    // Per-epoch overwrites (idempotent under replay), ledger LAST.
    verdicts.write.mode("overwrite").parquet(s"$verdictsDir/epoch=$batchId")
    bandsB.df.write.partitionBy("_bucket").mode("overwrite")
      .parquet(s"$bandsDir/epoch=$batchId")
    prep.df
      .withColumn("_pbucket",
        pmod(xxhash64(col("doc_id")), lit(nBuckets)).cast("int"))
      .write.partitionBy("_pbucket").mode("overwrite")
      .parquet(s"$payloadDir/epoch=$batchId")
    crossCands.foreach(_.release())
    bandsB.release()
    prep.release()
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
  }

  /** Production entry point (the startUpsert shape): document stream →
    * near-dedup sink. */
  def startNearDedup(src: DataFrame, target: String, thresh: Double,
      nBuckets: Int, checkpointDir: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : StreamingQuery = {
    val w = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch((df: DataFrame, id: Long) =>
        neardedupBatch(target, thresh, nBuckets)(df, id))
    trigger.fold(w)(w.trigger).start()
  }

  /** All verdicts accumulated so far, in the batch twin's shape and
    * order (doc_id, kept, dup_of, jaccard). */
  def readVerdicts(spark: SparkSession, target: String): DataFrame =
    spark.read.parquet(s"$target/verdicts")
      .select(col("doc_id"), col("kept"), col("dup_of"), col("jaccard"))
      .orderBy(col("doc_id"))
}
