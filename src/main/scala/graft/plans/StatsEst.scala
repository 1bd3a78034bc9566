package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Driver-side row estimation shared by every stats-driven graft
 * decision (the simjoin/tokjoin auto arm, hyperplane band sizing).
 * Preference order:
 *
 *  1. the plan's own `rowCount` (CBO + ANALYZE propagates it);
 *  2. the sum of LEAF rowCounts — catalog stats after `ANALYZE TABLE`
 *     sit on the leaf, and Range/LocalRelation leaves carry exact
 *     counts, but WITHOUT CBO the size-only stats visitor DROPS
 *     rowCount at the first Project above them (r5: a
 *     `spark.range(1e7).select(...)` read as 525 k rows through its
 *     projected sizeInBytes until this rung was added);
 *  3. leaf `sizeInBytes` / bytesPerRow. Leaves, not the derived plan's
 *     sizeInBytes: size-only propagation scales a Project's bytes by
 *     its column-width share, so `select(id, text)` over a wide table
 *     under-counts rows by that share (measured 50 k → 910 at sf0.1) —
 *     the full relation size is the honest base for a ROW estimate.
 *     `bytesPerRow` must be calibrated against COMPRESSED on-disk
 *     bytes (what file-relation sizeInBytes reports); erring low
 *     over-counts rows, which is the safe direction for every current
 *     caller (more LSH, wider bands).
 */
private[graft] object StatsEst {

  /** COMPRESSED bytes per row, calibrated per modality against the
    * on-disk test tables (r5; ADVICE r5 moved them here so every
    * caller of the same modality shares one constant): embeddings
    * measure ~40 B/row (64 synthetic floats compress 6×; incompressible
    * random vectors measure ~240 B), documents ~13 B/row (tiny-vocab
    * text). File-relation `sizeInBytes` IS compressed on-disk size, so
    * the divisor must match compressed reality; real corpora compress
    * LESS, so these divisors over-count rows there — erring toward the
    * LSH/wider-band arm, the plan that always finishes. The r5 split
    * (SimilarityRewrite at 40, band sizing at 280) under-counted
    * embedding rows 7× in bitsPerBandFor, sizing bands ~3 bits narrow
    * and re-admitting ~8× bucket occupancy. */
  val EstRowBytesVec = 40
  val EstRowBytesTok = 13

  def estimatedRows(plan: LogicalPlan, bytesPerRow: Int): BigInt =
    plan.stats.rowCount.getOrElse {
      val leaves = plan.collectLeaves()
      val leafCounts = leaves.flatMap(_.stats.rowCount)
      if (leaves.nonEmpty && leafCounts.size == leaves.size) leafCounts.sum
      else {
        val leafBytes = leaves.map(_.stats.sizeInBytes).sum
        (if (leafBytes > 0) leafBytes else plan.stats.sizeInBytes) / bytesPerRow
      }
    }
}
