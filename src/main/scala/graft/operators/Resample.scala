package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{KSeries, Lookup}

/** Resampling & time-series sampling (reference §2.7 — the reference's
  * specialty; ordered-only, reference src/Indices/LinearIndex.fs:263-264).
  *
  * All plans are shuffle-minimal: bucket assignment is either a scalar
  * expression (`resampleEquiv`, `sampleTime` — groupBy with map-side partial
  * agg, ONE shuffle) or an as-of join against a small boundary set
  * (`resample` — boundary side broadcastable).
  */
object Resample {

  /** Series.resampleEquiv — chunk by a key projection (e.g. month); chunk key
    * = projected key (reference src/SeriesModule.fs:726-752). Direct groupBy. */
  def resampleEquiv(
      s: KSeries,
      proj: Column => Column)(
      aggs: (Column => Column, String)*): DataFrame = {
    val aggExprs = aggs.map { case (f, n) => f(s.v).as(n) }
    s.df.groupBy(proj(s.k).as(s.keyCol))
      .agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Series.resample — chunk by EXPLICIT boundary keys
    * (reference src/Series.fs:388-441, kernel chunkedUsing
    * src/Common/Common.fs:555-595). Forward direction: each datum belongs to
    * the greatest boundary ≤ its key; data before the first boundary is
    * absorbed into the first chunk; EMPTY chunks are kept for unmatched
    * boundaries (reference test tests/.../Series.fs:221-227).
    *
    * Plan: as-of join data→boundaries (boundaries are small: broadcastable
    * union), then groupBy bucket, then right-join boundaries back to keep
    * empty buckets. */
  def resample(
      s: KSeries,
      boundaries: DataFrame,
      boundaryCol: String,
      direction: Lookup = Lookup.NearestSmaller)(
      aggs: (Column => Column, String)*): DataFrame = {
    require(direction != Lookup.Exact, "resample direction: NearestSmaller (Forward) or NearestGreater (Backward)")
    val b = boundaries.select(col(boundaryCol).as("__bucket")).distinct()
    val tagged = AsOf.join(
      left = s.df, leftKey = s.keyCol,
      right = b.withColumn("__bk", col("__bucket")), rightKey = "__bucket",
      valueCols = Seq("__bk"), direction = direction)
    // boundary chunks absorb outside data (reference chunkedUsing,
    // src/Common/Common.fs:555-595): Forward → data before the first
    // boundary joins the first chunk; Backward → data after the last
    // boundary joins the last chunk.
    val edge = direction match {
      case Lookup.NearestSmaller => b.agg(min(col("__bucket")).as("__edge"))
      case _                     => b.agg(max(col("__bucket")).as("__edge"))
    }
    val bucketed = tagged
      .join(edge)
      .withColumn("__bucket", coalesce(col("__bk"), col("__edge")))
    val aggExprs = aggs.map { case (f, n) => f(col(s.valueCol)).as(n) }
    val grouped = bucketed.groupBy(col("__bucket"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    // keep empty buckets:
    b.join(grouped, Seq("__bucket"), "left_outer")
      .withColumnRenamed("__bucket", s.keyCol)
  }

  /** Series.resampleUniform — resample by projection AND generate every key
    * in [min, max] of the projected range, filling empty buckets from the
    * nearest previous chunk (reference src/SeriesModule.fs:781-834).
    * `grid(lo, hi)` must yield an array Column of all keys (e.g. sequence()). */
  def resampleUniform(
      s: KSeries,
      proj: Column => Column,
      grid: (Column, Column) => Column)(
      agg: Column => Column): DataFrame = {
    val bucketed = s.df.groupBy(proj(s.k).as("__bucket"))
      .agg(agg(s.v).as(s.valueCol))
    val bounds = bucketed.agg(
      min(col("__bucket")).as("__lo"), max(col("__bucket")).as("__hi"))
    val gridDf = bounds.select(explode(grid(col("__lo"), col("__hi"))).as("__bucket"))
    val joined = gridDf.join(bucketed, Seq("__bucket"), "left_outer")
    // gap-fill forward (reference fillMode = Lookup.NearestSmaller default)
    val w = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, 0)
    joined.select(
      col("__bucket").as(s.keyCol),
      last(col(s.valueCol), ignoreNulls = true).over(w).as(s.valueCol))
  }

  /** Series.sampleTime — aggregate into a uniform `start + k*interval` grid
    * (reference src/SeriesModule.fs:839-947). Tumbling bucket as a scalar
    * expression on epoch time: one shuffle with partial aggregation; at
    * 100 TB this is exactly Structured Streaming's tumbling window shape. */
  def sampleTime(
      s: KSeries,
      intervalSec: Long)(
      aggs: (Column => Column, String)*): DataFrame = {
    val bucket = (floor(unix_timestamp(s.k) / intervalSec) * intervalSec).cast("long")
    val aggExprs = aggs.map { case (f, n) => f(s.v).as(n) }
    s.df.groupBy(bucket.as(s.keyCol)).agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Series.lookupTime / Sample — point-in-time value at each grid instant
    * with as-of lookup (reference src/SeriesModule.fs:862-1000). */
  def lookupTime(
      s: KSeries,
      gridDf: DataFrame,
      gridCol: String,
      direction: Lookup = Lookup.NearestSmaller): DataFrame =
    AsOf.join(
      left = gridDf.select(col(gridCol)), leftKey = gridCol,
      right = s.df, rightKey = s.keyCol,
      valueCols = Seq(s.valueCol), direction = direction)
}
