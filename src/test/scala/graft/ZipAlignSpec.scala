package graft

import org.apache.spark.sql.functions._

import graft.core.{JoinKind, KSeries, Lookup}

/** Port of the reference's series-level zipAlignInto directional tests
  * (tests/FSharp.DataFrame.Tests/Series.fs:277-343): align with
  * exact-or-nearest lookup that skips missing values, combine with
  * op(l**2 * r). Keys are day numbers standing in for the DateTime keys. */
class ZipAlignSpec extends SparkSpecBase {

  // reference fixtures: a = [9→1, 10→2, 11→3, 12→4], b = [8→8, 11→11]
  private def a = KSeries(seriesDf((9L, 1.0), (10L, 2.0), (11L, 3.0), (12L, 4.0)), ordered = true)
  private def b = KSeries(seriesDf((8L, 8.0), (11L, 11.0)), ordered = true)
  private val op = (l: org.apache.spark.sql.Column, r: org.apache.spark.sql.Column) =>
    pow(l, 2.0) * r

  test("zipAlign Left NearestSmaller (Series.fs:294-299)") {
    assert(collectKV(a.zipAlign(b, JoinKind.Left, Lookup.NearestSmaller)(op).df) === Seq(
      (9L, Some(8.0)), (10L, Some(32.0)), (11L, Some(99.0)), (12L, Some(16.0 * 11.0))))
  }

  test("zipAlign Left NearestGreater (Series.fs:302-308): missing past the last key") {
    assert(collectKV(a.zipAlign(b, JoinKind.Left, Lookup.NearestGreater)(op).df) === Seq(
      (9L, Some(11.0)), (10L, Some(44.0)), (11L, Some(99.0)), (12L, None)))
  }

  test("zipAlign Right NearestSmaller (Series.fs:311-317): result on the right series' keys") {
    assert(collectKV(b.zipAlign(a, JoinKind.Right, Lookup.NearestSmaller)(op).df) === Seq(
      (9L, Some(64.0 * 1.0)), (10L, Some(64.0 * 2.0)),
      (11L, Some(121.0 * 3.0)), (12L, Some(121.0 * 4.0))))
  }

  test("zipAlign Right NearestGreater (Series.fs:320-326)") {
    assert(collectKV(b.zipAlign(a, JoinKind.Right, Lookup.NearestGreater)(op).df) === Seq(
      (9L, Some(121.0 * 1.0)), (10L, Some(121.0 * 2.0)),
      (11L, Some(121.0 * 3.0)), (12L, None)))
  }

  test("zipAlign skips missing values in the lookup (Series.fs:330-343)") {
    val l = KSeries(seriesDf((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)), ordered = true)
    val r = KSeries(seriesDf((1L, 10.0), (2L, null), (3L, null), (4L, 40.0)), ordered = true)
    val got = collectKV(l.zipAlign(r, JoinKind.Left, Lookup.NearestSmaller)((_, rv) => rv).df)
    // keys 2 and 3 look PAST their missing exact-key value to 10.0 at key 1
    assert(got === Seq((1L, Some(10.0)), (2L, Some(10.0)), (3L, Some(10.0)), (4L, Some(40.0))))
  }

  test("zipAlign with Lookup.Exact degenerates to plain zipWith") {
    val got = collectKV(a.zipAlign(b, JoinKind.Left, Lookup.Exact)(op).df)
    assert(got === collectKV(a.zipWith(b, JoinKind.Left)(op).df))
  }
}
