package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source layer: loaders for the ten driver-generated parquet tables at
 * `/root/testdata/sf{0.001,0.01,0.1}/` (schemas: /root/repo/FIXTURES.md).
 *
 * Reference note (SURVEY.md §0): the reference checkout at /root/reference
 * was empty at survey time; `johnshiver/plankton` is an ETL orchestrator
 * whose "sources" are arbitrary user task code, so our source layer is
 * Spark's native parquet reader (schema from footers, vectorized read,
 * predicate pushdown / column pruning for free).
 *
 * Every query obtains inputs here, so identical scans share lineage and
 * Catalyst/AQE can reuse exchanges across subtrees of one plan.
 *
 * Scale note (100 TB): at cluster scale these would be partitioned tables
 * (events partitioned by date, lineitem by ship-month); the loader is the
 * single choke-point where `spark.read.parquet(dir)` would become a
 * partition-pruned catalog read. Nothing else in the engine would change.
 */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Idempotent session tuning every loader applies.
    *
    * `nanosAsLong`: events.ts is parquet INT64 TIMESTAMP(NANOS), which
    * Spark 4.1.2 refuses by default ([PARQUET_TYPE_ILLEGAL], verified —
    * FIXTURES.md gotcha #1). With the flag the column reads as LongType
    * nanos and stays on the vectorized reader path.
    */
  def tune(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    // Catalog resolution (r6, VERDICT r5 item 4): when the runner has
    // registered + ANALYZEd exactly this directory
    // (sources.CatalogStats.registerAndAnalyze), read through the
    // catalog so persisted rowCounts reach plan stats — the stats-driven
    // arms then decide on truth instead of leaf-byte estimates, with no
    // counting job at query time. Identical scan otherwise (same
    // parquet relation, pushdown/pruning unchanged). Registration is
    // per-table since r7 (stress dirs carry a subset of the ten names),
    // so a name missing from the catalog keeps its path read.
    val viaCatalog = spark.conf
      .getOption(sources.CatalogStats.CatalogDirKey).contains(dir) &&
      spark.catalog.tableExists(sources.CatalogStats.tableName(name))
    val df =
      if (viaCatalog) spark.table(sources.CatalogStats.tableName(name))
      else spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      // ns → µs with *integer* division: the long nanos (~1.7e18) exceed a
      // double's 53-bit mantissa, so `col/1000` (double divide) can be off
      // by 1 µs after truncation. `DIV` stays in long arithmetic — exact.
      // DuckDB reads the same column as TIMESTAMP (µs, truncated) so the
      // values agree; oracle SQL still casts explicitly for clarity.
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else df
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
