package graft.sources

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A complete DataSource V2 connector: a deterministic range generator
  * (`id`, `sq = id·id`) that implements the three contracts any connector
  * must honor to be viable at 100 TB:
  *
  *   - **filter pushdown** ([[SupportsPushDownFilters]]): >,>=,<,<=,= on
  *     `id` narrow the generated range at PLAN time — pushed filters are
  *     removed from the Spark-side plan entirely (they are exactly
  *     satisfied by the narrowed range);
  *   - **column pruning** ([[SupportsPushDownRequiredColumns]]): readers
  *     materialize only requested columns (`sq` is never computed for an
  *     `id`-only projection);
  *   - **partition skipping**: the range splits into `slices` partitions;
  *     slices outside the pushed bounds are never planned, so a selective
  *     filter costs proportionally less I/O — the moral equivalent of
  *     parquet row-group / partition-dir pruning, observable in the scan
  *     description (`range=[lo,hi) partitions=k/n`).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GraftRangeSource")
  *     .option("start", 0).option("end", 1000000).option("slices", 32).load()
  * }}}
  *
  * Mirrors the reference's Table/ScanView pull-source contract
  * (reference `src/operation/scan_view.rs:12-56` — a cursor over an
  * in-memory table with batch-size caps) re-expressed as the Spark
  * connector API; the driver's DuckDB oracle reproduces it as
  * `range(start, end)`.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.fullSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "0").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object GraftRangeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false)))
}

private[sources] class GraftRangeTable(start: Long, end: Long, slices: Int)
    extends Table with SupportsRead {
  require(slices > 0, s"slices must be positive (got $slices)")
  override def name(): String = s"graft_range($start,$end)"
  override def schema(): StructType = GraftRangeSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(start, end, slices)
}

private[sources] class GraftRangeScanBuilder(start0: Long, end0: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {
  // bounds narrowed by every accepted pushed filter (half-open [lo, hi))
  private var lo = start0
  private var hi = end0
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = GraftRangeSource.fullSchema
  private var aggNames: Array[String] = Array.empty

  // ---- aggregate pushdown (SupportsPushDownAggregates) ----
  // COUNT(*)/MIN(id)/MAX(id)/SUM(id) with no GROUP BY have CLOSED FORMS
  // on a half-open integer range — the connector answers the whole query
  // from [lo, hi) arithmetic and the scan emits ONE row, zero per-row
  // work: the strongest form of "let the source do it" (the moral
  // equivalent of answering COUNT(*) from parquet footer statistics).
  // Filters are pushed before aggregates (Spark's contract), so the
  // bounds are already narrowed. SUM is accepted only when the closed
  // form provably fits a BIGINT; otherwise the pushdown is REFUSED and
  // Spark computes the aggregate itself — refusal is always safe.
  private def aggName(e: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc)
      : Option[String] = {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.expressions.aggregate._
    def isId(col: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      col match {
        case r: NamedReference => r.fieldNames.sameElements(Array("id"))
        case _ => false
      }
    e match {
      case _: CountStar => Some("cnt")
      case m: Min if isId(m.column) => Some("mn")
      case m: Max if isId(m.column) => Some("mx")
      case s: Sum if isId(s.column) && !s.isDistinct && sumFits => Some("sm")
      case _ => None
    }
  }

  private def sumFits: Boolean = {
    val (l, h) = (math.max(lo, start0), math.min(hi, end0))
    // the closed form must fit a Long on BOTH sides: a range of
    // large-magnitude NEGATIVE ids underflows Long.MinValue just as a
    // positive one overflows Long.MaxValue, and the reader's .toLong
    // would silently wrap — refusing pushdown is the correct fallback.
    // All arithmetic in BigInt: h-l itself can exceed Long range.
    val sum = (BigInt(l) + (BigInt(h) - 1)) * (BigInt(h) - BigInt(l)) / 2
    h <= l || (sum <= BigInt(Long.MaxValue) && sum >= BigInt(Long.MinValue))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(aggName(_).isDefined)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    if (!supportCompletePushDown(agg)) false
    else {
      aggNames = agg.aggregateExpressions.map(aggName(_).get)
      true
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition {
      case GreaterThan("id", _: Long) | GreaterThanOrEqual("id", _: Long) |
           LessThan("id", _: Long) | LessThanOrEqual("id", _: Long) |
           EqualTo("id", _: Long) => true
      case _ => false
    }
    // saturating +1: v = Long.MaxValue must not wrap to MinValue (a pushed
    // filter is REMOVED from the Spark plan, so a wrapped bound would
    // silently return wrong rows, not just extra work). Saturation is
    // sufficient because no id can equal Long.MaxValue (end is exclusive).
    def inc(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    supported.foreach {
      case GreaterThan("id", v: Long) => lo = math.max(lo, inc(v))
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, inc(v))
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, inc(v))
      case f => throw new IllegalStateException(s"unreachable: $f")
    }
    accepted = supported
    rejected // Spark keeps only these as post-scan filters
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source column order regardless of the requested order
    required = StructType(GraftRangeSource.fullSchema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    if (aggNames.nonEmpty)
      new GraftRangeAggScan(math.max(lo, start0), math.min(hi, end0), aggNames)
    else
      new GraftRangeScan(start0, end0, math.max(lo, start0), math.min(hi, end0), slices, required)
}

/** Completely-pushed aggregate scan: one partition, one row, the
  * closed-form answers for the (already filter-narrowed) range. The
  * nullable MIN/MAX slots honor SQL semantics for an empty range.
  */
private[sources] class GraftRangeAggScan(lo: Long, hi: Long, aggNames: Array[String])
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(aggNames.map {
      case "cnt" => StructField("cnt", LongType, nullable = false)
      case n => StructField(n, LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRange range=[$lo,$hi) aggs=${aggNames.mkString(",")} (complete pushdown)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRangeSlice(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeAggReaderFactory(aggNames)
}

private[sources] class GraftRangeAggReaderFactory(aggNames: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[GraftRangeSlice]
    val empty = s.hi <= s.lo
    val values: Array[Any] = aggNames.map {
      case "cnt" => (if (empty) 0L else s.hi - s.lo): Any
      case "mn" => if (empty) null else s.lo
      case "mx" => if (empty) null else s.hi - 1
      case "sm" => if (empty) null
        else ((BigInt(s.lo) + (s.hi - 1)) * (s.hi - s.lo) / 2).toLong
      case other => throw new IllegalStateException(s"unreachable agg $other")
    }
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
  }
}

private[sources] case class GraftRangeSlice(lo: Long, hi: Long) extends InputPartition

private[sources] class GraftRangeScan(
    start0: Long, end0: Long, lo: Long, hi: Long, slices: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Slice the ORIGINAL range, then keep only slices overlapping the pushed
    * bounds — so the spec can observe genuine partition skipping (k of n
    * planned), exactly like partition-dir pruning on a keyed layout.
    */
  private def planned: Array[GraftRangeSlice] = {
    val n = end0 - start0
    if (n <= 0 || hi <= lo) Array.empty
    else (0 until slices).iterator.map { i =>
      GraftRangeSlice(
        start0 + i * n / slices,
        start0 + (i + 1) * n / slices)
    }.map(s => GraftRangeSlice(math.max(s.lo, lo), math.min(s.hi, hi)))
      .filter(s => s.hi > s.lo)
      .toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    planned.toArray[InputPartition]

  override def description(): String =
    s"GraftRange range=[$lo,$hi) partitions=${planned.length}/$slices cols=${required.fieldNames.mkString(",")}"

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required)
}

private[sources] class GraftRangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val s = partition.asInstanceOf[GraftRangeSlice]
    // resolve projection once per partition, not per row
    val emitters: Array[Long => Long] = required.fieldNames.map {
      case "id" => (id: Long) => id
      case "sq" => (id: Long) => id * id
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var cur = s.lo - 1
      override def next(): Boolean = { cur += 1; cur < s.hi }
      override def get(): InternalRow =
        new GenericInternalRow(emitters.map(e => e(cur): Any))
      override def close(): Unit = ()
    }
  }
}
