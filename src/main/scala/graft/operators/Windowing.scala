package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.core.KSeries

/** Boundary behavior for incomplete windows/chunks
  * (reference src/Common/Common.fs:79-83). */
sealed trait Boundary
object Boundary {
  /** keep incomplete segments at the beginning */
  case object AtBeginning extends Boundary
  /** keep incomplete segments at the end */
  case object AtEnding extends Boundary
  /** drop incomplete segments */
  case object Skip extends Boundary
}

/** Sliding windows / fixed chunks / key-distance windows over an ordered
  * series (reference §2.6: Aggregation<'K> machinery,
  * src/Indices/LinearIndex.fs:208-233 over kernels
  * src/Common/Common.fs:511-654).
  *
  * The reference materializes every window as a fresh sub-series — O(n·w).
  * Here each op is ONE window-function pass (whole-stage codegen, running
  * frames), per SURVEY §3 trace 3.
  *
  * All ops take `partitionBy`: empty reproduces the reference's global order;
  * non-empty partitions the scan (per-symbol / per-user series), which is the
  * shape big data actually has. An unpartitioned call over a LARGE series
  * (plan stats above `spark.graft.globalWindow.maxBytes`, numeric-keyed)
  * auto-routes to the bounded-overlap stitch in [[OrderedScan]] — same
  * results, never a single-task global window (see
  * [[OrderedScan.slidingAgg]] / [[OrderedScan.slidingRangeAgg]] /
  * [[OrderedScan.chunkAgg]]).
  */
object Windowing {

  private def baseWindow(s: KSeries, partitionBy: Seq[Column]): WindowSpec =
    if (partitionBy.isEmpty) Window.orderBy(s.k)
    else Window.partitionBy(partitionBy: _*).orderBy(s.k)

  /** Series.windowInto n — sliding count-window of size n ending at each key;
    * key = LAST key of the window (reference src/SeriesModule.fs:281-301).
    * Boundary.Skip drops the first n-1 incomplete windows; AtBeginning keeps
    * them (growing prefixes). Pass aggregates over the `agg` builder applied
    * to the frame. */
  def windowInto(
      s: KSeries,
      n: Int,
      boundary: Boundary,
      partitionBy: Seq[Column] = Nil)(
      agg: Column => Column): DataFrame = {
    require(boundary != Boundary.AtEnding, "AtEnding windows: key = first key — use windowIntoForward")
    if (partitionBy.isEmpty && OrderedScan.autoRoutes(s.df, s.keyCol))
      return OrderedScan.slidingAgg(s.df, s.keyCol, s.valueCol, n, boundary, agg, s.valueCol)
    val w = baseWindow(s, partitionBy).rowsBetween(-(n - 1), 0)
    val out = s.df.select(
      s.k.as(s.keyCol),
      agg(s.v).over(w).as(s.valueCol),
      count(lit(1)).over(w).as("__cnt"))
    val filtered = boundary match {
      case Boundary.Skip        => out.where(col("__cnt") === n)
      case Boundary.AtBeginning => out
      case Boundary.AtEnding    => out
    }
    filtered.drop("__cnt")
  }

  /** AtEnding variant: windows anchored forward, key = FIRST key. */
  def windowIntoForward(
      s: KSeries,
      n: Int,
      boundary: Boundary,
      partitionBy: Seq[Column] = Nil)(
      agg: Column => Column): DataFrame = {
    if (partitionBy.isEmpty && OrderedScan.autoRoutes(s.df, s.keyCol))
      return OrderedScan.slidingAgg(s.df, s.keyCol, s.valueCol, n, boundary, agg, s.valueCol,
        descending = true)
    val w = baseWindow(s, partitionBy).rowsBetween(0, n - 1)
    val out = s.df.select(
      s.k.as(s.keyCol),
      agg(s.v).over(w).as(s.valueCol),
      count(lit(1)).over(w).as("__cnt"))
    if (boundary == Boundary.Skip) out.where(col("__cnt") === n).drop("__cnt")
    else out.drop("__cnt")
  }

  /** Series.windowDistInto — window while lastKey - firstKey < d, i.e. a
    * RANGE frame over the key (reference src/SeriesModule.fs:318-334).
    * Backward-looking: all rows with key in (k - d, k]. `dist` must be in the
    * key's range units (cast timestamps to epoch first). */
  def windowDistInto(
      s: KSeries,
      dist: Long,
      partitionBy: Seq[Column] = Nil)(
      agg: Column => Column): DataFrame = {
    if (partitionBy.isEmpty && OrderedScan.autoRoutes(s.df, s.keyCol) &&
        OrderedScan.supportsRangeArith(s.df.schema(s.keyCol).dataType))
      return OrderedScan.slidingRangeAgg(s.df, s.keyCol, s.valueCol, dist, agg, s.valueCol)
    val w0 =
      if (partitionBy.isEmpty) Window.orderBy(s.k.cast("long"))
      else Window.partitionBy(partitionBy: _*).orderBy(s.k.cast("long"))
    val w = w0.rangeBetween(-(dist - 1), 0)
    s.df.select(s.k.as(s.keyCol), agg(s.v).over(w).as(s.valueCol))
  }

  /** Series.chunkInto n — non-overlapping chunks of n rows from the start;
    * key = FIRST key of the chunk (reference src/SeriesModule.fs:383-399).
    * Boundary.Skip drops a trailing incomplete chunk; AtBeginning aligns
    * chunks to the END (incomplete chunk first). Result: one row per chunk. */
  def chunkInto(
      s: KSeries,
      n: Int,
      boundary: Boundary,
      partitionBy: Seq[String] = Nil)(
      aggs: (Column => Column, String)*): DataFrame = {
    if (partitionBy.isEmpty && OrderedScan.autoRoutes(s.df, s.keyCol))
      return OrderedScan.chunkAgg(s.df, s.keyCol, s.valueCol, n, boundary, aggs)
    // project first, then refer to columns by name only (fresh attributes)
    val base = s.df.select(
      (partitionBy.map(col) :+ s.k.as(s.keyCol) :+ s.v.as(s.valueCol)): _*)
    val w =
      if (partitionBy.isEmpty) Window.orderBy(col(s.keyCol))
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(col(s.keyCol))
    val wAll =
      if (partitionBy.isEmpty) Window.partitionBy()
      else Window.partitionBy(partitionBy.map(col): _*)
    val ord = row_number().over(w) - 1
    val chunkId = boundary match {
      // AtBeginning aligns chunks to the END: incomplete chunk comes first
      case Boundary.AtBeginning => -floor((count(lit(1)).over(wAll) - 1 - ord) / n)
      case _                    => floor(ord / n)
    }
    val withChunk = base
      .withColumn("__chunk", chunkId)
      .withColumn("__sz", count(lit(1)).over(
        if (partitionBy.isEmpty) Window.partitionBy(col("__chunk"))
        else Window.partitionBy((partitionBy.map(col) :+ col("__chunk")): _*)))
    val kept = if (boundary == Boundary.Skip) withChunk.where(col("__sz") === n) else withChunk
    val gcols = if (partitionBy.isEmpty) Seq(col("__chunk")) else partitionBy.map(col) :+ col("__chunk")
    val aggExprs =
      min(col(s.keyCol)).as(s.keyCol) +:
        aggs.map { case (f, name) => f(col(s.valueCol)).as(name) }
    kept.groupBy(gcols: _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .drop("__chunk")
  }
}
