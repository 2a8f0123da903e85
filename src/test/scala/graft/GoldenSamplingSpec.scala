package graft

import org.apache.spark.sql.functions._

import graft.core.{KSeries, Lookup}
import graft.operators.{AsOf, Resample}

/** The reference's golden time-sampling tests ported with their EXACT
  * expected outputs (reference tests/FSharp.DataFrame.Tests/Series.fs:117-235).
  * Keys are epoch seconds (the reference's DateTimes at UTC). */
class GoldenSamplingSpec extends SparkSpecBase {

  import spark.implicits._

  private val H = 3600L
  private val D = 86400L

  private def epoch(y: Int, m: Int, d: Int, hours: Double = 0.0): Long =
    java.time.LocalDate.of(y, m, d).toEpochDay * D + (hours * 3600).round

  /** generate dt ts count: value i at dt + i*ts (reference Series.fs:117-118). */
  private def gen(start: Long, stepSec: Long, count: Int): KSeries =
    KSeries(
      (0 until count).map(i => (start + i * stepSec, i.toDouble))
        .toDF("k", "v"), ordered = true)

  test("Sample by time: value at or just before each daily 3PM instant (Series.fs:121-134)") {
    // input+1: value i+1 at 2011-12-27 + i*11.23h, 20 points
    val input = gen(epoch(2011, 12, 27), (11.23 * 3600).round, 20).mapValues(_ + 1)
    val grid = (0 until 10).map(i => epoch(2011, 12, 27, 15.0) + i * D).toDF("g")
    val got = collectKV(Resample.lookupTime(input, grid, "g"), "g", "v")
    val expectVals = Seq(2, 4, 6, 8, 10, 13, 15, 17, 19, 20)
    assert(got.map(_._2.get.toInt) === expectVals)
  }

  test("Sample by time span: as-of at minute marks incl. past-the-end (TestMinuteSampling, Series.fs:145-155)") {
    val input = gen(epoch(2011, 12, 2), 0, 50).copy(df =
      (0 until 50).map(i => (epoch(2011, 12, 2) * 1000 + (i * 2500L), i.toDouble))
        .toDF("k", "v")) // 2.5s steps need millis
    val grid = (0 to 3).map(i => epoch(2011, 12, 2) * 1000 + i * 60000L).toDF("g")
    val got = collectKV(Resample.lookupTime(input, grid, "g"), "g", "v")
    assert(got.map(_._2.get.toInt) === Seq(0, 24, 48, 49))
  }

  test("Downsampling: last previous value at each hour mark (TestDownSampling, Series.fs:157-167)") {
    val input = gen(epoch(2012, 2, 12), (5.37 * 60).round, 50)
    val grid = (0 to 5).map(i => epoch(2012, 2, 12) + i * H).toDF("g")
    val got = collectKV(Resample.lookupTime(input, grid, "g"), "g", "v")
    assert(got.map(_._2.get.toInt) === Seq(0, 11, 22, 33, 44, 49))
  }

  test("GetItems with NearestSmaller: nearest previous key or missing (TestExplicitTimeSamples, Series.fs:169-181)") {
    val input = gen(epoch(2012, 1, 1), 3 * D, 15).mapValues(_ + 1)
    val samples = Seq(
      epoch(2011, 12, 20), epoch(2012, 1, 5), epoch(2012, 1, 8),
      epoch(2012, 1, 19), epoch(2012, 1, 29)).toDF("g")
    val got = collectKV(
      AsOf.join(samples, "g", input.df, "k", Seq("v"), Lookup.NearestSmaller), "g", "v")
    assert(got.map(_._2.map(_.toInt)) ===
      Seq(None, Some(2), Some(3), Some(7), Some(10)))
  }

  test("ResampleUniform: latest value per day (TestDaySampling, Series.fs:136-143)") {
    val input = gen(epoch(2011, 12, 2), (5.23 * 3600).round, 20)
    val r = Resample.resampleUniform(
      input,
      k => (floor(k / D) * D).cast("long"),
      (lo, hi) => sequence(lo, hi, lit(D)))(max)
    val got = collectKV(r)
    assert(got.map(t => (t._1, t._2.get.toInt)) === Seq(
      epoch(2011, 12, 2) -> 4, epoch(2011, 12, 3) -> 9, epoch(2011, 12, 4) -> 13,
      epoch(2011, 12, 5) -> 18, epoch(2011, 12, 6) -> 19))
  }

  test("ResampleUniform forward-fills empty days (TestForwardFillSampling, Series.fs:183-194)") {
    val input = KSeries(Seq(
      epoch(2012, 5, 25) -> 1.0, epoch(2012, 5, 26) -> 2.0,
      epoch(2012, 5, 29) -> 5.0, epoch(2012, 5, 30) -> 6.0).toDF("k", "v"),
      ordered = true)
    val r = Resample.resampleUniform(
      input,
      k => (floor(k / D) * D).cast("long"),
      (lo, hi) => sequence(lo, hi, lit(D)))(max)
    assert(collectKV(r).map(_._2.get) === Seq(1.0, 2.0, 2.0, 2.0, 5.0, 6.0))
  }

  test("resample keeps empty chunks for unmatched keys (Series.fs:221-227)") {
    val input = gen(epoch(2012, 2, 12), 48 * H, 5)
    val keys = (12 to 20).map(d => epoch(2012, 2, d)).toDF("b")
    val r = Resample.resample(input, keys, "b")((min(_), "v"))
    val got = r.select(col("k"), coalesce(col("v"), lit(-1.0)).as("v"))
      .collect().map(x => (x.getLong(0), x.getDouble(1).toInt)).sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(0, -1, 1, -1, 2, -1, 3, -1, 4))
  }

  test("groupKFold: cluster members share a fold; group counts balanced ±1") {
    import graft.operators.Sampling
    val docs = (0L until 40L).map(i => (i, s"d$i")).toDF("doc_id", "name")
    // clusters: {0,1,2}, {10,11}; everything else singleton → 37 groups
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.groupKFold(docs, "doc_id", pairs, k = 5)
      .select(col("doc_id"), col("rep_id"), col("fold"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length === 40)
    val foldOf = out.map(r => r._1 -> r._3).toMap
    assert(foldOf(0L) === foldOf(1L) && foldOf(1L) === foldOf(2L))
    assert(foldOf(10L) === foldOf(11L))
    val groupsPerFold = out.map(r => (r._2, r._3)).distinct
      .groupBy(_._2).view.mapValues(_.size).toMap
    assert(groupsPerFold.values.max - groupsPerFold.values.min <= 1)
    assert(groupsPerFold.values.sum === 37)
  }
}
