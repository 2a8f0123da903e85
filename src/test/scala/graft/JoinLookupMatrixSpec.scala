package graft

import org.apache.spark.sql.functions._

import graft.core.{KFrame, Lookup}
import graft.operators.{AsOf, OrderedScan}

/** The reference's join×lookup alignment matrix and frame-fill tests with
  * hand-computed expectations (reference
  * tests/FSharp.DataFrame.Tests/Frame.fs:189-302). Days at integer keys
  * 0,1,2; Times offset half a step later at 0.5,1.5,2.5 (scaled ×10 to stay
  * integral). */
class JoinLookupMatrixSpec extends SparkSpecBase {

  import spark.implicits._

  private val days = Seq((0L, 0.0), (10L, 1.0), (20L, 2.0)).toDF("k", "Days")
  private val times = Seq((5L, 0.5), (15L, 1.5), (25L, 2.5)).toDF("k", "Times")

  private def vals(df: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Double]] =
    df.orderBy("k").select(c).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  test("left-align NearestSmaller: missing when no smaller exists (Frame.fs:189-201)") {
    val j = AsOf.join(days, "k", times, "k", Seq("Times"), Lookup.NearestSmaller)
    assert(vals(j, "Times") === Seq(None, Some(0.5), Some(1.5)))
  }

  test("left-align NearestGreater: always finds a greater value (Frame.fs:203-214)") {
    val j = AsOf.join(days, "k", times, "k", Seq("Times"), Lookup.NearestGreater)
    assert(vals(j, "Times") === Seq(Some(0.5), Some(1.5), Some(2.5)))
  }

  test("right-align NearestSmaller: always finds a smaller value (Frame.fs:216-227)") {
    val j = AsOf.join(times, "k", days, "k", Seq("Days"), Lookup.NearestSmaller)
    assert(vals(j, "Days") === Seq(Some(0.0), Some(1.0), Some(2.0)))
  }

  test("right-align NearestGreater: missing when no greater exists (Frame.fs:229-240)") {
    val j = AsOf.join(times, "k", days, "k", Seq("Days"), Lookup.NearestGreater)
    assert(vals(j, "Days") === Seq(Some(1.0), Some(2.0), None))
  }

  private def sparseFrame = {
    val rows = (0 to 100).map { i =>
      (i.toLong,
        if (i % 3 == 0) None else Some(i.toDouble),
        if (i % 5 == 0) None else Some(i.toDouble),
        if (i % 20 == 0) None else Some(i.toDouble),
        Some(i.toDouble))
    }
    rows.map { case (k, a, b, c, d) =>
      (k, a.map(Double.box).orNull, b.map(Double.box).orNull,
        c.map(Double.box).orNull, d.map(Double.box).orNull)
    }.toDF("k", "A", "B", "C", "D")
  }

  test("Frame.fillMissing Forward over 4 columns (Frame.fs:245-259)") {
    val filled = OrderedScan.forwardFill(sparseFrame, "k", Seq("A", "B", "C"), buckets = 4)
    val row0 = filled.where(col("k") === 0).head
    assert(row0.isNullAt(1) && row0.isNullAt(2) && row0.isNullAt(3)) // nothing before 0
    assert(row0.getDouble(4) === 0.0)
    val row10 = filled.where(col("k") === 10).head
    assert(row10.getDouble(1) === 10.0) // A present at 10
    assert(row10.getDouble(2) === 9.0)  // B missing at 10 (10%5=0) → carried 9
    assert(row10.getDouble(3) === 10.0)
  }

  test("Frame.fillMissingWith constant (Frame.fs:261-273)") {
    val filled = sparseFrame.na.fill(0.0)
    val row0 = filled.where(col("k") === 0).head
    assert((1 to 4).map(row0.getDouble) === Seq(0.0, 0.0, 0.0, 0.0))
    val row10 = filled.where(col("k") === 10).head
    assert((1 to 4).map(row10.getDouble) === Seq(10.0, 0.0, 10.0, 10.0))
  }

  test("left join fills missing at the exact key (Frame.fs:280-296)") {
    // right value at key 2 is missing → as-of returns key 1's value
    val miss = Tables.canonical(Seq((1L, 1.0), (2L, Double.NaN)).toDF("k", "A"))
    val full = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "B")
    val j = AsOf.join(full, "k", miss, "k", Seq("A"), Lookup.NearestSmaller)
    assert(vals(j, "A") === Seq(Some(1.0), Some(1.0)))
  }

  test("left zip only fills the JOINED side's missing values (Frame.fs:298-302)") {
    val miss = KFrame(
      Tables.canonical(Seq((1L, 1.0), (2L, Double.NaN)).toDF("k", "A")),
      Seq("k"), ordered = true)
    val full = KFrame(Seq((1L, 2.0), (2L, 3.0)).toDF("k", "A"), Seq("k"), ordered = true)
    val z = miss.zipAlign(full, Lookup.NearestSmaller)(_ + _)
    // left's own missing at key 2 stays missing; only the other side fills
    assert(vals(z.df, "A") === Seq(Some(3.0), None))
  }
}
