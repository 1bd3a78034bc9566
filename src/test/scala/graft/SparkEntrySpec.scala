package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract-level checks on the SparkEntry registry (no Spark needed). */
class SparkEntrySpec extends AnyFunSuite {

  test("no duplicate query keys across operator families") {
    val total = SparkEntry.groups.map(_._1.size).sum
    assert(SparkEntry.queries.size === total,
      "a query key is defined in more than one family object")
  }

  test("every oracleSql key has a corresponding query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without query: $orphans")
  }

  test("every bench headline name is a registered query (typos would silently drop a bench entry)") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"headline names not in the registry: $missing")
  }

  test("queryFiles covers every registry row and points at real files (--changed mode)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.queryFiles.keySet
    assert(missing.isEmpty,
      s"rows with no --changed file mapping (new family not added to queryFiles?): $missing")
    val gone = SparkEntry.queryFiles.values.toSet
      .filterNot(f => new java.io.File(f).isFile)
    assert(gone.isEmpty, s"queryFiles points at nonexistent files: $gone")
  }

  test("oracle SQL strings are DuckDB-shaped (no read_parquet paths, bare table names)") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("read_parquet"), s"$name embeds a path")
      assert(sql.trim.nonEmpty)
    }
  }
}
