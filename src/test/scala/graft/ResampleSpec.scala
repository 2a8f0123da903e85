package graft

import org.apache.spark.sql.functions._

import graft.core.KSeries
import graft.operators.Resample

/** Resample semantics: boundary chunks absorb outside data and EMPTY buckets
  * are kept (reference src/Common/Common.fs:555-595,
  * test tests/FSharp.DataFrame.Tests/Series.fs:221-227). */
class ResampleSpec extends SparkSpecBase {

  private def s(rows: (Long, java.lang.Double)*): KSeries =
    KSeries(seriesDf(rows: _*), ordered = true)

  test("explicit boundaries: absorption + empty buckets kept") {
    import spark.implicits._
    val in = s((1L, 1.0), (2L, 2.0), (12L, 12.0), (30L, 30.0))
    val bounds = Seq(10L, 20L, 25L).toDF("b")
    val r = Resample.resample(in, bounds, "b")((sum(_), "total"), (count(_), "n"))
    val got = r.select("k", "total", "n").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getDouble(1)),
        if (x.isNullAt(2)) 0L else x.getLong(2))).toSet
    // keys 1,2 are before the first boundary → absorbed into bucket 10
    // key 12 → bucket 10; key 30 → bucket 25; bucket 20 is EMPTY but kept
    assert(got === Set(
      (10L, Some(15.0), 3L),
      (20L, None, 0L),
      (25L, Some(30.0), 1L)))
  }

  test("resampleEquiv groups by projection") {
    val in = s((10L, 1.0), (11L, 2.0), (20L, 3.0))
    val r = Resample.resampleEquiv(in, k => (floor(k / 10) * 10).cast("long"))((sum(_), "v"))
    assert(collectKV(r) === Seq((10L, Some(3.0)), (20L, Some(3.0))))
  }

  test("resampleUniform fills empty buckets from the previous chunk") {
    val in = s((10L, 1.0), (30L, 3.0))
    val r = Resample.resampleUniform(
      in,
      k => (floor(k / 10) * 10).cast("long"),
      (lo, hi) => sequence(lo, hi, lit(10L)))(sum)
    // grid 10,20,30; bucket 20 empty → forward-filled with bucket 10's value
    assert(collectKV(r) === Seq((10L, Some(1.0)), (20L, Some(1.0)), (30L, Some(3.0))))
  }

  test("lookupTime: point-in-time as-of at grid instants") {
    import spark.implicits._
    val in = s((1L, 1.0), (5L, 5.0))
    val grid = Seq(0L, 3L, 7L).toDF("g")
    val r = Resample.lookupTime(in, grid, "g")
    assert(collectKV(r, "g", "v") === Seq((0L, None), (3L, Some(1.0)), (7L, Some(5.0))))
  }
}
