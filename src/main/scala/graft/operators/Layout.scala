package graft.operators

import graft.Tables
import graft.Q.QFn
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators (round 9): Z-order (Morton) clustering — the
 * multi-dimensional sort that makes file-level min/max pruning work for
 * MORE THAN ONE predicate column at once. A 100 TB table laid out by a
 * single sort key prunes scans on that key and nothing else; writing it
 * in Z-order of (k1, k2) bounds BOTH keys' min/max spans per file at
 * ~√(domain), so either predicate skips ~all files it cannot match.
 * This is the layout step behind Delta/Iceberg OPTIMIZE ZORDER BY,
 * built here from first principles: interleave the bits of the two
 * (folded) dimensions into one BIGINT, then range-partition and sort by
 * that key at write time.
 *
 * The z-value is pure bit arithmetic (shift/AND/OR-free addition of
 * disjoint bits) — identical integer semantics in Spark and DuckDB, so
 * the registry row is oracle-checked exactly. The registry query folds
 * each dimension to 8 bits (mod 256, the per-file resolution that
 * matters for pruning), computes the 16-bit z-value, and reports
 * per-z-range bucket extents: equal-WIDTH buckets (zval div 2048 → 32
 * buckets = files), NOT ntile — bucket assignment is a projection, so
 * the whole query is scan → projection → 32-group hash agg with no
 * global sort or unpartitioned window anywhere.
 *
 * The bucket extents ARE the pruning claim: bucket b fixes the top bits
 * of the z-value, which fixes the top ~bits/2 of BOTH dimensions, so
 * every bucket's a-span and b-span collapse to a fraction of the
 * 0..255 domain (LayoutSpec pins ≤ 63 — 16 z-buckets of 4096 would
 * give ≤ 127, 32 of 2048 give ≤ 63/31). A date-sorted layout leaves
 * the custkey span at the full 255 in every file.
 *
 * [[zorderWrite]] is the physical half: the same z-value as the
 * repartitionByRange key + sortWithinPartitions, so written files carry
 * disjoint z-ranges (verified round-trip in LayoutSpec).
 */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integer SQL expressions: a's bit i lands at 2i, b's at 2i+1. The
    * terms occupy disjoint bit positions, so `+` is bit-OR and the
    * translation is the same arithmetic in any SQL dialect. */
  def zExprSql(a: String, b: String, bits: Int,
      shr: (String, Int) => String, shl: (String, Int) => String): String =
    (0 until bits).map { i =>
      val ai = shl(s"(${shr(a, i)} & 1)", 2 * i)
      val bi = shl(s"(${shr(b, i)} & 1)", 2 * i + 1)
      s"($ai + $bi)"
    }.mkString(" + ")

  private def sparkZ(a: String, b: String, bits: Int): String =
    zExprSql(a, b, bits,
      (e, n) => s"shiftright($e, $n)", (e, n) => s"shiftleft($e, $n)")

  private def duckZ(a: String, b: String, bits: Int): String =
    zExprSql(a, b, bits, (e, n) => s"($e >> $n)", (e, n) => s"($e << $n)")

  /** The folded dimensions of the registry row: customer key and order
    * date (days since the corpus epoch), each mod 256. */
  private val DimA = "CAST(o_custkey % 256 AS BIGINT)"
  private val DimB =
    "CAST(datediff(o_orderdate, DATE '1992-01-01') % 256 AS BIGINT)"
  private val DimADuck = "CAST(o_custkey % 256 AS BIGINT)"
  private val DimBDuck =
    "CAST(DATE_DIFF('day', DATE '1992-01-01', o_orderdate) % 256 AS BIGINT)"

  /** Append a 2·bits-bit Morton key of (aExpr, bExpr) — a projection,
    * no shuffle. */
  def withZValue(df: DataFrame, aExpr: String, bExpr: String,
      bits: Int = 8, as: String = "zval"): DataFrame =
    df.withColumn(as, expr(sparkZ(s"CAST($aExpr AS BIGINT)",
      s"CAST($bExpr AS BIGINT)", bits)))

  /** Physically lay out `df` in Z-order of the two dimensions: one
    * range-shuffle on the Morton key into `nFiles` write tasks, sorted
    * within each, so every written file covers a disjoint z-range (and
    * therefore a bounded rectangle of the two dims). This is the write
    * path a 100 TB table runs ONCE so that every later scan with a
    * predicate on either dimension prunes by footer min/max. */
  def zorderWrite(df: DataFrame, aExpr: String, bExpr: String,
      path: String, nFiles: Int, bits: Int = 8): Unit =
    withZValue(df, aExpr, bExpr, bits)
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(path)

  /** Bin count the compaction planner packs toward: target bin size =
    * table total div 8 — data-derived so the plan is meaningful at
    * every sf (a fixed absolute byte/row target degenerates to
    * one-file-per-bin below it and one-bin-for-everything above). */
  val CompactTargetBins = 8

  /**
   * Small-file compaction PLANNER (r17 — VERDICT r16 #5): the other
   * half of OPTIMIZE — [[zorderWrite]] clusters, this bin-packs. A
   * date-partitioned event log accretes one small file per partition
   * per load; the weekly compaction job plans file → output-bin
   * assignments toward a target size, then rewrites each bin as one
   * file ([[compactWrite]]).
   *
   * Packing rule: NEXT-FIT-DECREASING by cumulative chunking — order
   * the parts by size descending (ties by partition key), take the
   * EXCLUSIVE running sum, bin = cum div target. One pass, pure
   * integer, identical window arithmetic in Spark and DuckDB — which
   * is why this variant is the planner: classic first-fit-decreasing's
   * gap-filling revisits earlier bins (a sequential fold, not a window)
   * and buys at most one extra part per bin over NFD at this shape,
   * while losing the hash-matchable oracle. Every bin except the
   * highest-numbered crosses its target boundary, so bins land within
   * one part of the target — the property LayoutSpec pins against a
   * driver-side sequential fold.
   *
   * The registry row plans over the per-day partitions of `events`
   * with ROW COUNTS as the size measure (the oracle can see rows, not
   * file bytes; rows ∝ bytes for a fixed schema). Scale shape: sizes
   * come from one #partitions-group agg; the ranking window runs over
   * FILE METADATA (one row per partition — thousands at 100 TB, never
   * corpus rows), the same bounded-frame class as the IVF centroid
   * windows.
   */
  def compactPlan(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val f = events
      .groupBy(to_date(col("ts")).as("part_date"))
      .agg(count(lit(1)).as("n_rows"))
    val tot = f.agg(sum(col("n_rows")).as("total_rows"))
    val wCum = Window.orderBy(col("n_rows").desc, col("part_date"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wBin = Window.partitionBy(col("bin"))
    f.crossJoin(broadcast(tot))
      .withColumn("target",
        greatest(expr(s"total_rows div $CompactTargetBins"), lit(1L)))
      .withColumn("cum", coalesce(sum(col("n_rows")).over(wCum), lit(0L)))
      .withColumn("bin", expr("cum div target"))
      .select(col("part_date"), col("n_rows"), col("bin"),
        sum(col("n_rows")).over(wBin).as("bin_total"),
        count(lit(1)).over(wBin).as("bin_parts"))
      .orderBy(col("bin"), col("n_rows").desc, col("part_date"))
  }

  /** Execute a [[compactPlan]] against the date-partitioned events
    * warehouse table: join each partition's rows to its planned bin (a
    * #partitions-row broadcast), hash-colocate each bin onto one task,
    * and write hive-partitioned by bin — every bin's rows sit in ONE
    * task, so each `bin=<k>/` directory gets exactly one file (a range
    * shuffle would depend on sampled boundaries and can split or merge
    * bins). Returns the planned bin count; LayoutSpec round-trips file
    * count and row totals against it. */
  def compactWrite(s: org.apache.spark.sql.SparkSession, d: String,
      path: String): Long = {
    val t = Relational.ensureDatePartitionedEvents(s, d)
    val plan = compactPlan(Tables.events(s, d))
      .select(col("part_date"), col("bin"))
    val nBins = plan.agg(max(col("bin"))).head().getLong(0) + 1
    s.table(t)
      .join(broadcast(plan), col("d") === col("part_date"))
      .drop("part_date")
      .repartition(nBins.toInt, col("bin"))
      .sortWithinPartitions(col("bin"), col("d"))
      .write.mode("overwrite").partitionBy("bin").parquet(path)
    nBins
  }

  val queries: Map[String, QFn] = Map(
    "layout_compact" -> ((s, d) => compactPlan(Tables.events(s, d))),

    "layout_zorder" -> ((s, d) => {
      val z = sparkZ(DimA, DimB, 8)
      Tables.orders(s, d)
        .withColumn("zval", expr(z))
        .withColumn("bucket", expr("zval div 2048"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          min(expr(DimA)).as("a_min"), max(expr(DimA)).as("a_max"),
          min(expr(DimB)).as("b_min"), max(expr(DimB)).as("b_max"))
        .withColumn("a_span", col("a_max") - col("a_min"))
        .withColumn("b_span", col("b_max") - col("b_min"))
        .orderBy(col("bucket"))
    }))

  val oracleSql: Map[String, String] = Map(
    // NFD-by-cumulative-chunking, the exact window spelling of
    // compactPlan; target denominator interpolated from the same val.
    "layout_compact" ->
      s"""WITH f AS (SELECT CAST(ts AS DATE) AS part_date,
         |    CAST(COUNT(*) AS BIGINT) AS n_rows FROM events GROUP BY 1),
         | tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows FROM f),
         | o AS (SELECT part_date, n_rows,
         |    GREATEST(total_rows // $CompactTargetBins, 1) AS target,
         |    COALESCE(CAST(SUM(n_rows) OVER (
         |      ORDER BY n_rows DESC, part_date
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |      0) AS cum
         |   FROM f CROSS JOIN tot),
         | b AS (SELECT part_date, n_rows, cum // target AS bin FROM o)
         |SELECT part_date, n_rows, bin,
         | CAST(SUM(n_rows) OVER (PARTITION BY bin) AS BIGINT) AS bin_total,
         | CAST(COUNT(*) OVER (PARTITION BY bin) AS BIGINT) AS bin_parts
         |FROM b ORDER BY bin, n_rows DESC, part_date""".stripMargin,

    "layout_zorder" -> {
      val z = duckZ(DimADuck, DimBDuck, 8)
      s"""WITH o AS (SELECT *, $z AS zval FROM orders),
         | b AS (SELECT zval // 2048 AS bucket,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    MIN($DimADuck) AS a_min, MAX($DimADuck) AS a_max,
         |    MIN($DimBDuck) AS b_min, MAX($DimBDuck) AS b_max
         |   FROM o GROUP BY 1)
         |SELECT bucket, n, a_min, a_max, b_min, b_max,
         |  a_max - a_min AS a_span, b_max - b_min AS b_span
         |FROM b ORDER BY bucket""".stripMargin
    })
}
