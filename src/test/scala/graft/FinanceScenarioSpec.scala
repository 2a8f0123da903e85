package graft

import org.apache.spark.sql.functions._

import graft.core.{KFrame, Lookup}

/** The reference's realistic finance scenario, ported with its exact
  * expectations (reference tests/FSharp.DataFrame.Tests/Frame.fs:317-470):
  * two companies, a 1:2 share split, preferred shares trading on a different
  * calendar, year-end net-debt forecasts — market cap and enterprise value
  * via zipAlign with NearestSmaller/NearestGreater lookups. */
class FinanceScenarioSpec extends SparkSpecBase {

  import spark.implicits._

  private def d(day: Int): Long = // Sep 2013, as epoch day
    java.time.LocalDate.of(2013, 9, day).toEpochDay
  private def dAt(y: Int, m: Int, dd: Int): Long =
    java.time.LocalDate.of(y, m, dd).toEpochDay

  // prices (reference Frame.fs:323-341)
  private lazy val pxCommons = KFrame(Seq(
    (d(10), 100.0, 200.0), (d(11), 101.0, 200.0), (d(12), 101.0, 200.0),
    (d(13), 101.0, 201.0), (d(14), 102.0, 101.0), (d(15), 103.0, 101.5),
    (d(16), 104.0, 102.0)).toDF("k", "A", "B"), Seq("k"), ordered = true)

  // B prefs: not traded on 9/11, 9/12 (reference Frame.fs:348-356)
  private lazy val pxPrefs = KFrame(Seq(
    (d(10), 20.0), (d(13), 21.0), (d(14), 22.0), (d(15), 23.0), (d(16), 24.0))
    .toDF("k", "B"), Seq("k"), ordered = true)

  // shares outstanding; B split 1:2 on Sep-14 (reference Frame.fs:360-366)
  private lazy val sharesCommons = KFrame(Seq(
    (dAt(2012, 12, 31), Some(10.0), Some(20.0)),
    (d(14), None, Some(40.0)))
    .toDF("k", "A", "B"), Seq("k"), ordered = true)
  private lazy val sharesPrefs = KFrame(Seq(
    (dAt(2012, 12, 31), 20.0)).toDF("k", "B"), Seq("k"), ordered = true)

  // net debt forecast at year end (reference Frame.fs:369-371)
  private lazy val netDebt = KFrame(Seq(
    (dAt(2013, 12, 31), 100.0, 1000.0)).toDF("k", "A", "B"), Seq("k"), ordered = true)

  private def colVals(f: KFrame, c: String): Seq[Double] =
    f.df.orderBy("k").select(c).collect().map(_.getDouble(0)).toSeq

  test("market cap via zipAlign Left NearestSmaller (Frame.fs:373-400)") {
    val mktCapCommons = pxCommons.zipAlign(sharesCommons, Lookup.NearestSmaller)(_ * _)
    assert(colVals(mktCapCommons, "A") ===
      Seq(1000.0, 1010.0, 1010.0, 1010.0, 1020.0, 1030.0, 1040.0))
    // the split on 9/14 doubles B's share count as-of that day
    assert(colVals(mktCapCommons, "B") ===
      Seq(4000.0, 4000.0, 4000.0, 4020.0, 4040.0, 4060.0, 4080.0))
  }

  test("company mktcap across column sets: commons + as-of prefs (Frame.fs:403-431)") {
    val mktCapCommons = pxCommons.zipAlign(sharesCommons, Lookup.NearestSmaller)(_ * _)
    val mktCapPrefs = pxPrefs.zipAlign(sharesPrefs, Lookup.NearestSmaller)(_ * _)
    // company B total: commons every day + pref mktcap carried as-of
    // (prefs didn't trade 9/11-12 → 9/10's 400 carries forward)
    val mktCapB = KFrame(mktCapCommons.df.select(col("k"), col("B")), Seq("k"), ordered = true)
      .zipAlign(mktCapPrefs, Lookup.NearestSmaller)(_ + _)
    assert(colVals(mktCapB, "B") ===
      Seq(4400.0, 4400.0, 4400.0, 4440.0, 4480.0, 4520.0, 4560.0))
  }

  test("enterprise value: + net debt with NearestGreater (Frame.fs:434-470)") {
    val mktCapCommons = pxCommons.zipAlign(sharesCommons, Lookup.NearestSmaller)(_ * _)
    val mktCapPrefs = pxPrefs.zipAlign(sharesPrefs, Lookup.NearestSmaller)(_ * _)
    val mktCapB = KFrame(mktCapCommons.df.select(col("k"), col("B")), Seq("k"), ordered = true)
      .zipAlign(mktCapPrefs, Lookup.NearestSmaller)(_ + _)
    val mktCap = KFrame(
      mktCapCommons.df.select(col("k"), col("A"))
        .join(mktCapB.df.select(col("k"), col("B")), Seq("k")),
      Seq("k"), ordered = true)
    // net debt is a year-END forecast → looked up FORWARD (NearestGreater)
    val ev = mktCap.zipAlign(netDebt, Lookup.NearestGreater)(_ + _)
    assert(colVals(ev, "A") ===
      Seq(1100.0, 1110.0, 1110.0, 1110.0, 1120.0, 1130.0, 1140.0))
    assert(colVals(ev, "B") ===
      Seq(5400.0, 5400.0, 5400.0, 5440.0, 5480.0, 5520.0, 5560.0))
  }
}
