package graft.sources

import graft.Q.QFn
import org.apache.spark.sql.functions._

/**
 * Registry queries over the custom DataSource V2 surface — the
 * `graft-range` connector ([[GraftRangeSource]]) exercised through the
 * SAME oracle gate as every relational operator (not just unit-tested):
 * DuckDB's `range()` table function is the reference for the identical
 * integer stream, so a planning bug (overlapping slices, off-by-one at
 * a partition boundary, dropped remainder rows) breaks the hash match.
 *
 * The aggregate shape (filter → group → sum) is deliberate: it proves
 * rows survive a real plan (scan → filter → shuffle → agg), and the
 * group-by-residue output stays 10 rows no matter how large the range —
 * the verify artifact doesn't scale with the source.
 */
object SourceOps {

  val queries: Map[String, QFn] = Map(
    "scan_dsv2_range" -> ((s, _) => {
      // sfDir is unused: the source is synthetic by design. 100k rows
      // over 8 slices exercises multi-partition planning incl. uneven
      // slice boundaries (100000 / 8 is exact; the REQUIRE'd contiguity
      // is covered by SourceSpec's odd-slice case).
      s.read.format("graft-range")
        .option("start", 0).option("end", 100000).option("slices", 8)
        .load()
        .filter(col("id") % 7 === 0)
        .groupBy((col("id") % 10).as("residue"))
        .agg(count(lit(1)).as("n"),
          sum(col("id")).as("sum_id"),
          sum(col("id_squared")).as("sum_sq"),
          min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
        .orderBy(col("residue"))
    }),

    "scan_dsv2_pushdown" -> ((s, _) => {
      // Same aggregate shape, but the predicate is a RANGE conjunction
      // the connector's SupportsPushDownFilters consumes at planning:
      // [42000, 54000) covers 12% of the source, so only the 1–2 slices
      // it overlaps are ever planned (the other 6+ never become tasks).
      // The oracle proves the pruned read returns exactly the rows a
      // full-scan-then-filter would — a pruning bug (clamped boundary
      // off by one, dropped remainder) breaks the hash match.
      s.read.format("graft-range")
        .option("start", 0).option("end", 100000).option("slices", 8)
        .load()
        .filter(col("id") >= 42000 && col("id") < 54000)
        .groupBy((col("id") % 10).as("residue"))
        .agg(count(lit(1)).as("n"),
          sum(col("id")).as("sum_id"),
          sum(col("id_squared")).as("sum_sq"),
          min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
        .orderBy(col("residue"))
    }))

  // DuckDB's range() emits one column named `range`.
  val oracleSql: Map[String, String] = Map(
    "scan_dsv2_range" ->
      """WITH t AS (SELECT range AS id FROM RANGE(0, 100000)
        |           WHERE range % 7 = 0)
        |SELECT id % 10 AS residue, COUNT(*) AS n,
        | CAST(SUM(id) AS BIGINT) AS sum_id,
        | CAST(SUM(id * id) AS BIGINT) AS sum_sq,
        | MIN(id) AS min_id, MAX(id) AS max_id
        |FROM t GROUP BY residue ORDER BY residue""".stripMargin,

    "scan_dsv2_pushdown" ->
      """WITH t AS (SELECT range AS id FROM RANGE(0, 100000)
        |           WHERE range >= 42000 AND range < 54000)
        |SELECT id % 10 AS residue, COUNT(*) AS n,
        | CAST(SUM(id) AS BIGINT) AS sum_id,
        | CAST(SUM(id * id) AS BIGINT) AS sum_sq,
        | MIN(id) AS min_id, MAX(id) AS max_id
        |FROM t GROUP BY residue ORDER BY residue""".stripMargin)
}
