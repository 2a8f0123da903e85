package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** floor(col / w) as a cell id, exact for every numeric dtype. Integral
    * columns use `(c - pmod(c, w)) div w` — integer-only arithmetic, so
    * epoch-nano longs beyond 2^53 don't lose precision the way a double
    * division would (and unlike `cast("long")`, pmod-then-div floors toward
    * -inf for negative values). Fractional columns floor the real quotient,
    * so a point at 20.3 with width 10 lands in cell 2 instead of the cell of
    * a truncated 20. */
  private def cellOf(name: String, w: Long, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        expr(s"(`$name` - pmod(`$name`, $w)) div $w")
      case _ => floor(col(name) / lit(w.toDouble)).cast("long")
    }
  }

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
    val pDt = points.schema(pointCol).dataType
    val sDt = intervals.schema(startCol).dataType
    val eDt = intervals.schema(endCol).dataType
    val p = points.withColumn("__cell", cellOf(pointCol, cellWidth, pDt))
    // End is exclusive: the last overlapped cell is floor(end/w), EXCEPT
    // when end sits exactly on a cell boundary — then no point of the
    // interval reaches that cell. (The old `cast("long") - 1` form silently
    // dropped matches for fractional ends: [5.0, 20.5) must emit cell 2
    // because 20.3 lives there.)
    val lastCell = cellOf(endCol, cellWidth, eDt) -
      when(pmod(col(endCol), lit(cellWidth)) === lit(0), lit(1)).otherwise(lit(0))
    // degenerate intervals (end <= start) match nothing — and MUST be
    // dropped before the explode: sequence(a, b) with a > b silently steps
    // DESCENDING, so one corrupt row would fan out into millions of cells
    val i = intervals.where(col(endCol) > col(startCol))
      .withColumn("__cell", explode(sequence(
        cellOf(startCol, cellWidth, sDt), lastCell)))
    p.join(i, Seq("__cell"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__cell")
  }
}
