package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Condition-based chunking: `chunkWhile pred` — consecutive keys stay in the
  * same chunk while `pred(firstKey, currentKey)` holds (reference
  * src/SeriesModule.fs:448-463, kernel src/Common/Common.fs:511-547).
  *
  * Not expressible as a SQL window frame (the chunk boundary depends on the
  * running first-key, which depends on earlier boundaries — an inherently
  * sequential recurrence), so per SURVEY §4 gap 2 this drops to imperative
  * per-partition logic: sort by key, then a single linear scan per group via
  * `mapPartitions`.
  *
  * Scale: with `partitionBy` keys the recurrence runs independently per
  * group after one shuffle (repartition on the group key), which is the
  * 100 TB shape. The global (no-partition) variant necessarily serializes
  * into one task — same caveat as the reference's single-threaded engine,
  * documented rather than hidden.
  */
object ChunkWhile {

  /** Assign a chunk id to every row. `pred(first, current)` compares key
    * values (as Long — cast keys to epoch/integral first).
    * Output: input columns + `chunk_id` (the chunk's first key). */
  def assign(
      df: DataFrame,
      keyCol: String,
      pred: (Long, Long) => Boolean,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val outSchema = df.schema.add(StructField("chunk_id", LongType, nullable = false))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    val sorted =
      if (partitionBy.isEmpty)
        df.repartition(1).sortWithinPartitions(col(keyCol))
      else
        df.repartition(partitionBy.map(col): _*)
          .sortWithinPartitions((partitionBy.map(col) :+ col(keyCol)): _*)

    val keyIdx = df.schema.fieldIndex(keyCol)
    val partIdx = partitionBy.map(df.schema.fieldIndex)

    sorted.mapPartitions { rows =>
      var curGroup: Seq[Any] = null
      var first = Long.MinValue
      var started = false
      rows.map { r =>
        val k = r.getLong(keyIdx)
        val g = partIdx.map(r.get)
        if (!started || g != curGroup || !pred(first, k)) {
          first = k; curGroup = g; started = true
        }
        Row.fromSeq(r.toSeq :+ first)
      }
    }
  }

  /** Series.windowWhile — for every row, the window of FOLLOWING rows whose
    * keys satisfy `pred(firstKey, currentKey)` (reference
    * src/SeriesModule.fs:350-365, kernel windowedWhile
    * src/Common/Common.fs:511-547). Key of the window = its first key.
    *
    * Emits one output row per (window, member): `window_key` + the input
    * columns — aggregate with groupBy(window_key). Unlike chunkWhile the
    * windows OVERLAP, so this is a per-partition two-pointer scan buffering
    * at most one window (O(n·w) output like the reference, but streamed).
    */
  def windowAssign(
      df: DataFrame,
      keyCol: String,
      pred: (Long, Long) => Boolean,
      partitionBy: Seq[String] = Nil): DataFrame = {
    val outSchema = df.schema.add(StructField("window_key", LongType, nullable = false))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    val sorted =
      if (partitionBy.isEmpty)
        df.repartition(1).sortWithinPartitions(col(keyCol))
      else
        df.repartition(partitionBy.map(col): _*)
          .sortWithinPartitions((partitionBy.map(col) :+ col(keyCol)): _*)

    val keyIdx = df.schema.fieldIndex(keyCol)
    val partIdx = partitionBy.map(df.schema.fieldIndex)

    sorted.mapPartitions { rows =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      var group: Seq[Any] = null

      def flushWindows(): Iterator[Row] = {
        // snapshot: the returned iterator is lazy and buf mutates afterwards
        val snap = buf.toVector
        val n = snap.size
        // two-pointer: window starting at i extends while pred(k_i, k_j)
        for {
          i <- (0 until n).iterator
          first = snap(i).getLong(keyIdx)
          j <- Iterator.from(i).takeWhile(j => j < n && pred(first, snap(j).getLong(keyIdx)))
        } yield Row.fromSeq(snap(j).toSeq :+ first)
      }

      new Iterator[Row] {
        private var inner: Iterator[Row] = Iterator.empty
        private var done = false
        private def advance(): Unit = {
          while (!inner.hasNext && !done) {
            if (rows.hasNext) {
              val r = rows.next()
              val g = partIdx.map(r.get)
              if (group != null && g != group) {
                val w = flushWindows(); buf.clear(); buf += r; group = g
                inner = w
              } else { group = g; buf += r }
            } else {
              done = true
              inner = flushWindows()
            }
          }
        }
        def hasNext: Boolean = { advance(); inner.hasNext }
        def next(): Row = { advance(); inner.next() }
      }
    }
  }
}
