package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * Minimal DataSource V2 `TableProvider` (VERDICT r3 #7 — the "extract
 * from an arbitrary source" extension point plankton pipelines get from
 * task code, SURVEY.md §2e): a read-only deterministic synthetic range,
 * registered by the short name `graft-range` via the
 * DataSourceRegister service file.
 *
 *   spark.read.format("graft-range")
 *     .option("start", 0).option("end", 100000).option("slices", 8)
 *     .load()
 *
 * Schema: (id BIGINT, id_squared BIGINT, gauss DOUBLE) — gauss is a
 * cheap deterministic hash-derived value in [0, 1) so downstream demos
 * have a numeric column that isn't a function-of-row-position triviality.
 *
 * This is deliberately the SMALLEST complete V2 surface — provider →
 * table → scan-builder → batch → partitions → reader — the skeleton a
 * real connector (JDBC slice reader, message-queue snapshot, internal
 * blob format) starts from. Two scale-relevant contracts are real:
 * partition planning (`slices` input splits become `slices` independent
 * `InputPartition`s, so a 1000-executor cluster reads 1000 slices in
 * parallel with zero driver involvement beyond planning) and COLUMN
 * PRUNING (`SupportsPushDownRequiredColumns`: readers materialize only
 * the columns the query touches — what keeps a 2-column projection over
 * a wide source from reading whole rows; plan-pinned in IoSpec) — the
 * same contracts every production V2 source (parquet, kafka, delta)
 * follows.
 */
class GraftRangeSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-range"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000").toLong,
      properties.getOrDefault("slices", "4").toInt)
}

private[sources] object GraftRangeTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("id_squared", LongType, nullable = false),
    StructField("gauss", DoubleType, nullable = false)))
}

private[sources] class GraftRangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  require(end >= start, s"graft-range: end=$end < start=$start")
  require(slices > 0, s"graft-range: slices=$slices must be positive")

  override def name(): String = s"graft_range($start, $end)"
  override def schema(): StructType = GraftRangeTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      // Column pruning pushdown: Catalyst hands the connector the set of
      // columns the query actually touches, and the readers materialize
      // ONLY those — the contract that makes a 2-column projection over
      // a wide 100 TB source read 2 columns' worth of bytes, not the
      // row. Visible in .explain as the BatchScan's pruned ReadSchema
      // (plan-pinned in IoSpec).
      private var required: StructType = GraftRangeTable.schema
      override def pruneColumns(requiredSchema: StructType): Unit =
        // an empty projection (e.g. COUNT(*)) still needs row COUNT —
        // keep zero fields and emit empty rows
        required = requiredSchema
      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this
      // Partition planning: contiguous [lo, hi) slices. Pure arithmetic —
      // the driver never materializes a row.
      override def planInputPartitions(): Array[InputPartition] = {
        val n = end - start
        (0 until slices).map { i =>
          val lo = start + n * i / slices
          val hi = start + n * (i + 1) / slices
          GraftRangePartition(lo, hi): InputPartition
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftRangeReaderFactory(required.fieldNames)
    }
}

private[sources] case class GraftRangePartition(lo: Long, hi: Long)
    extends InputPartition

private[sources] class GraftRangeReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = part.lo - 1
      override def next(): Boolean = { cur += 1; cur < part.hi }
      override def get(): InternalRow = {
        // only the pruned columns are computed and shipped
        val values: Array[Any] = columns.map {
          case "id" => cur
          case "id_squared" => cur * cur
          case "gauss" =>
            // splitmix64-style finalizer → uniform [0, 1): deterministic
            // per id, no RNG state to coordinate across executors
            var z = cur + 0x9e3779b97f4a7c15L
            z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
            z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
            z = z ^ (z >>> 31)
            (z >>> 11).toDouble / (1L << 53).toDouble
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
