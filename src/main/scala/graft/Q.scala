package graft

import org.apache.spark.sql.{Column, SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Shared helpers encoding the DuckDB-oracle determinism rules
 * (SURVEY.md §7d / FIXTURES.md gotchas):
 *
 *  - money math accumulates in DECIMAL (exact, associative — immune to
 *    partial-aggregation order differing from DuckDB's single-threaded
 *    sum), final result cast to DOUBLE so output schemas match;
 *  - DECIMAL scale 4, not 2: `l_extendedprice*(1-l_discount)` has exactly
 *    four decimal digits, so the double→decimal cast at scale 4 never has
 *    to round — scale 2 would hit half-up-vs-binary tie divergence
 *    between Spark (rounds the shortest decimal rendering) and DuckDB
 *    (rounds the exact binary value);
 *  - unavoidable double outputs (avg, stddev, corr, cosine) are rounded
 *    to 4 dp on both engines;
 *  - averages are `CAST(sum_decimal AS DOUBLE) / count` on BOTH engines —
 *    one IEEE-754 double division with identical operands is bit-stable
 *    across engines, unlike each engine's own avg() implementation.
 */
object Q {
  /** Signature of every entry in SparkEntry.queries. */
  type QFn = (SparkSession, String) => DataFrame

  /** Exact decimal view of a money/measure column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** SUM with exact decimal accumulation, double result. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** AVG as one double division over the exact decimal sum. */
  def moneyAvg(c: Column): Column =
    round(sum(dec(c)).cast("double") / count(lit(1)), 4)

  /** Round-to-4dp for double outputs compared against DuckDB. */
  def r4(c: Column): Column = round(c, 4)
}
