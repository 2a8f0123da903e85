package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match fact rows at a point to interval rows with
  * `start <= point < end`. Spark has no native range join — a plain range
  * predicate plans as a broadcast-nested-loop (fine for a broadcast-sized
  * interval table, quadratic otherwise). The scale path here is the grid
  * trick: bucket time into `cellWidth` cells, have each interval emit one
  * row per overlapped cell and each point exactly one row, hash-equi-join
  * on the cell id, and apply the exact predicate afterwards. Duplication is
  * `intervalLength / cellWidth + 1` per interval — pick `cellWidth` near
  * the median interval length to keep it O(1). Both sides shuffle once on
  * the cell key; skewed cells fall under AQE's skew-join handling like any
  * equi-join. */
object RangeJoin {

  /** Join `points` (numeric/epoch `pointCol`) to `intervals`
    * (`[startCol, endCol)` numeric): inner join keeping all columns of
    * both sides. */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      cellWidth: Long): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    require(!points.columns.contains("__cell") && !intervals.columns.contains("__cell"),
      "__cell is reserved by pointInInterval")
    val p = points.withColumn("__cell",
      floor(col(pointCol).cast("long") / cellWidth))
    // degenerate intervals (end <= start) match nothing — and MUST be
    // dropped before the explode: sequence(a, b) with a > b silently steps
    // DESCENDING, so one corrupt row would fan out into millions of cells
    val i = intervals.where(col(endCol) > col(startCol))
      .withColumn("__cell", explode(sequence(
        floor(col(startCol).cast("long") / cellWidth),
        // end is exclusive: last overlapped cell holds end-1
        floor((col(endCol).cast("long") - 1) / cellWidth))))
    p.join(i, Seq("__cell"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__cell")
  }
}
