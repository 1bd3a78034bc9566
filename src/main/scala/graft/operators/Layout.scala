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

  val queries: Map[String, QFn] = Map(
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
