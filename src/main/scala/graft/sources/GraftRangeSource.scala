package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
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
 * blob format) starts from. Four scale-relevant contracts are real:
 *
 *  - partition planning: `slices` input splits become `slices`
 *    independent `InputPartition`s, so a 1000-executor cluster reads
 *    1000 slices in parallel with zero driver involvement beyond
 *    planning;
 *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): readers
 *    materialize only the columns the query touches — what keeps a
 *    2-column projection over a wide source from reading whole rows;
 *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): id-range comparisons
 *    (`=`, `<`, `<=`, `>`, `>=`) narrow the planned [lo, hi) interval
 *    at PLANNING time, so slices outside the predicate are never even
 *    created — the partition-pruning contract that makes a selective
 *    predicate over a 100 TB source schedule 1 task, not 10⁵. Pushed
 *    conjuncts are fully enforced by the range itself (exact, not
 *    best-effort), so they are consumed — Spark plans no residual
 *    Filter for them;
 *  - LIMIT PUSHDOWN (`SupportsPushDownLimit`): a bare LIMIT n clamps
 *    the planned interval to its first n ids (reported as partial, so
 *    Spark's own global limit still runs — any n rows satisfy an
 *    unordered limit, and these are the cheapest n to produce);
 *  - AGGREGATE PUSHDOWN (`SupportsPushDownAggregates`, r5 — the rung
 *    after filters/limit on the connector ladder): an ungrouped
 *    COUNT(*) / MIN(id) / MAX(id) over the (filter-narrowed) interval
 *    is CLOSED-FORM — count = hi−lo, min = lo, max = hi−1 — so the
 *    pushdown is COMPLETE: Spark plans no aggregate at all, and the
 *    scan emits the one answer row from planning arithmetic (a single
 *    synthetic partition; zero row reads). This is the same contract
 *    that lets a JDBC source answer COUNT(*) with `SELECT COUNT(*)`
 *    server-side, or parquet answer MIN/MAX from footer statistics —
 *    on a 100 TB source it is the difference between a metadata lookup
 *    and a full scan. Anything else (SUM, AVG, gauss columns,
 *    GROUP BY) is declined and Spark aggregates raw rows as before.
 *
 * All five are plan-pinned in IoSpec; the same contracts every
 * production V2 source (parquet, kafka, delta, JDBC) follows.
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
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns
        with SupportsPushDownFilters with SupportsPushDownLimit
        with SupportsPushDownAggregates {
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

      // Filter pushdown: id-range comparisons narrow [effLo, effHi) at
      // planning. The source generates exactly [lo, hi) per slice, so a
      // pushed range conjunct is EXACTLY enforced — accepted filters are
      // consumed (not returned as residual) and Spark plans no Filter
      // node for them. Everything else (modulo, gauss predicates, OR
      // trees) comes back as residual and evaluates post-scan as usual.
      // Values arrive as the analyzer's promoted literals — any integral
      // java.lang.Number; IsNotNull on non-nullable columns is trivially
      // true and consumed so a lone range predicate leaves NO residual.
      private var effLo: Long = start
      private var effHi: Long = end
      private var accepted: Array[Filter] = Array.empty
      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        def longOf(v: Any): Option[Long] = v match {
          case n: java.lang.Long => Some(n)
          case n: java.lang.Integer => Some(n.longValue)
          case n: java.lang.Short => Some(n.longValue)
          case n: java.lang.Byte => Some(n.longValue)
          case _ => None
        }
        def push(f: Filter): Boolean = f match {
          case EqualTo("id", v) => longOf(v).exists { x =>
            effLo = math.max(effLo, x); effHi = math.min(effHi, x + 1); true }
          case GreaterThan("id", v) => longOf(v).exists { x =>
            effLo = math.max(effLo, x + 1); true }
          case GreaterThanOrEqual("id", v) => longOf(v).exists { x =>
            effLo = math.max(effLo, x); true }
          case LessThan("id", v) => longOf(v).exists { x =>
            effHi = math.min(effHi, x); true }
          case LessThanOrEqual("id", v) => longOf(v).exists { x =>
            effHi = math.min(effHi, x + 1); true }
          case IsNotNull(c) => GraftRangeTable.schema.fieldNames.contains(c)
          case _ => false
        }
        val (ok, residual) = filters.partition(push)
        accepted = ok
        residual
      }
      override def pushedFilters(): Array[Filter] = accepted

      // Limit pushdown: clamp to the first `limit` ids of the (already
      // filter-narrowed) interval. Partial by contract — Spark keeps its
      // global limit, the source just stops PLANNING work past row n.
      private var pushedLimit: Long = Long.MaxValue
      override def pushLimit(limit: Int): Boolean = {
        pushedLimit = limit.toLong
        true
      }
      override def isPartiallyPushed: Boolean = true

      // Aggregate pushdown: accepted only when the WHOLE aggregation is
      // answerable from the pushed interval (ungrouped count/min/max on
      // id) — then the pushdown is COMPLETE (Spark plans no agg node)
      // and planInputPartitions emits one synthetic answer row. Filters
      // are pushed before aggregates in V2ScanRelationPushDown, so the
      // interval is already narrowed when the answer is computed.
      private var pushedAggs: Seq[String] = Nil
      private def aggSupported(agg: Aggregation): Boolean = {
        def isId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
          e match {
            case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
            case _ => false
          }
        agg.groupByExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty &&
          agg.aggregateExpressions.forall {
            case _: CountStar => true
            case m: Min => isId(m.column)
            case m: Max => isId(m.column)
            case _ => false
          }
      }
      override def supportCompletePushDown(agg: Aggregation): Boolean =
        aggSupported(agg)
      override def pushAggregation(agg: Aggregation): Boolean = {
        if (!aggSupported(agg)) false
        else {
          pushedAggs = agg.aggregateExpressions.toSeq.map {
            case _: CountStar => "count"
            case _: Min => "min"
            case _ => "max"
          }
          true
        }
      }
      private def aggResultSchema: StructType =
        StructType(pushedAggs.zipWithIndex.map {
          case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
          case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
        })

      override def build(): Scan = this
      override def readSchema(): StructType =
        if (pushedAggs.nonEmpty) aggResultSchema else required
      override def toBatch: Batch = this
      override def description(): String = {
        val hi =
          if (pushedLimit == Long.MaxValue || effHi - effLo <= pushedLimit) effHi
          else effLo + pushedLimit
        s"GraftRange[$start,$end) pushed=[$effLo,$hi) " +
          s"filters=${accepted.mkString("[", ",", "]")} " +
          s"limit=${if (pushedLimit == Long.MaxValue) "none" else pushedLimit}" +
          (if (pushedAggs.nonEmpty) s" aggs=${pushedAggs.mkString("[", ",", "]")}"
           else "")
      }
      // Partition planning: contiguous [lo, hi) slices of the ORIGINAL
      // range, intersected with the pushed interval; empty slices are
      // dropped — fewer planned partitions is the observable contract a
      // selective predicate buys (plan-pinned in IoSpec). Pure
      // arithmetic — the driver never materializes a row.
      override def planInputPartitions(): Array[InputPartition] = {
        if (pushedAggs.nonEmpty) {
          // Complete agg pushdown: ONE synthetic partition carrying the
          // closed-form answers; nothing iterates the interval.
          val cnt = math.max(0L, effHi - effLo)
          val values: Seq[Any] = pushedAggs.map {
            case "count" => cnt
            case "min" => if (cnt > 0) effLo else null
            case "max" => if (cnt > 0) effHi - 1 else null
          }
          return Array(GraftAggResultPartition(values))
        }
        val n = end - start
        val hiEff =
          if (pushedLimit == Long.MaxValue || effHi - effLo <= pushedLimit) effHi
          else effLo + pushedLimit
        (0 until slices).iterator
          .map { i =>
            val lo = start + n * i / slices
            val hi = start + n * (i + 1) / slices
            GraftRangePartition(math.max(lo, effLo), math.min(hi, hiEff))
          }
          .filter(p => p.lo < p.hi)
          .map(p => p: InputPartition)
          .toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftRangeReaderFactory(required.fieldNames)
    }
}

private[sources] case class GraftRangePartition(lo: Long, hi: Long)
    extends InputPartition

/** The one-row answer of a completely-pushed-down aggregation. */
private[sources] case class GraftAggResultPartition(values: Seq[Any])
    extends InputPartition

private[sources] class GraftRangeReaderFactory(columns: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case agg: GraftAggResultPartition => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = InternalRow.fromSeq(agg.values)
        override def close(): Unit = ()
      }
      case part: GraftRangePartition => rowReader(part)
    }

  private def rowReader(part: GraftRangePartition): PartitionReader[InternalRow] = {
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
