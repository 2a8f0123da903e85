package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 lazy range-series source — the Spark-native analog of the
  * reference's `DelayedSeries.Create` (reference src/DelayedSeries.fs:1-60,
  * spy tests tests/FSharp.DataFrame.Tests/LazySeries.fs:30-90): a series
  * that exists only as a loader over a key range, where SLICING the series
  * narrows the range the loader ever materializes. Here the loader is a
  * `Batch` scan and the narrowing is genuine Catalyst filter pushdown
  * (`SupportsPushDownFilters` over the key) plus column pruning
  * (`SupportsPushDownRequiredColumns`); the driver-side `loads` spy records
  * what each scan actually materialized, exactly like the reference's
  * loader-invocation assertions. The narrowed range also bounds
  * `planInputPartitions` — partition pruning falls out of the pushdown.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.RangeSeriesSource")
  *   .option("lo", 0).option("hi", 1000000)
  *   .option("slices", 8).option("spy", "myScan").load()
  * }}}
  * Schema: (k long, v double) with v = k * 0.5 (deterministic generator —
  * a stand-in for the reference's user-supplied loader function).
  */
class RangeSeriesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSeriesSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RangeSeriesTable(
      properties.get("lo").toLong,
      properties.get("hi").toLong,
      Option(properties.get("slices")).map(_.toInt).getOrElse(4),
      Option(properties.get("spy")).getOrElse(""))
}

object RangeSeriesSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** Loader-call log: spy key → (lo, hi exclusive, materialized columns).
    * Written on the DRIVER at plan time (planInputPartitions), read by
    * specs — the analog of LazySeries.fs's loader-range assertions. */
  val loads: TrieMap[String, (Long, Long, Seq[String])] = TrieMap.empty

  def valueAt(k: Long): Double = k * 0.5
}

private[sources] class RangeSeriesTable(lo: Long, hi: Long, slices: Int, spy: String)
    extends Table with SupportsRead {
  override def name(): String = s"range_series($lo,$hi)"
  override def schema(): StructType = RangeSeriesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeSeriesScanBuilder(lo, hi, slices, spy)
}

private[sources] class RangeSeriesScanBuilder(lo0: Long, hi0: Long, slices: Int, spy: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = lo0
  private var hi = hi0 // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSeriesSource.schema

  private def longOf(v: Any): Option[Long] = v match {
    case n: Number => Some(n.longValue())
    case _ => None
  }

  /** Range predicates over k narrow [lo, hi) — the DelayedSeries range
    * restriction; anything else is a residual Spark re-applies. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case GreaterThan("k", v) => longOf(v).exists { x => lo = math.max(lo, x + 1); true }
      case GreaterThanOrEqual("k", v) => longOf(v).exists { x => lo = math.max(lo, x); true }
      case LessThan("k", v) => longOf(v).exists { x => hi = math.min(hi, x); true }
      case LessThanOrEqual("k", v) => longOf(v).exists { x => hi = math.min(hi, x + 1); true }
      case EqualTo("k", v) =>
        longOf(v).exists { x => lo = math.max(lo, x); hi = math.min(hi, x + 1); true }
      case _ => false
    }
    pushed = filters.diff(residual)
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new RangeSeriesScan(lo, hi, slices, spy, required)
}

private[sources] class RangeSeriesScan(
    lo: Long, hi: Long, slices: Int, spy: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"range_series [$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  /** The "loader call": only the NARROWED range is ever planned — the spy
    * records it, and the input partitions cover nothing outside it. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (spy.nonEmpty)
      RangeSeriesSource.loads(spy) = (lo, hi, required.fieldNames.toSeq)
    val n = math.max(1, slices)
    val total = math.max(0L, hi - lo)
    (0 until n).map { i =>
      RangeSlice(lo + total * i / n, lo + total * (i + 1) / n): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required)
}

private[sources] case class RangeSlice(lo: Long, hi: Long) extends InputPartition

private[sources] class RangeReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangeSlice]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var k = p.lo - 1
      override def next(): Boolean = { k += 1; k < p.hi }
      override def get(): InternalRow = InternalRow.fromSeq(fields.toSeq.map {
        case "k" => k
        case "v" => RangeSeriesSource.valueAt(k)
      })
      override def close(): Unit = ()
    }
  }
}
