package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{JoinKind, KFrame}
import graft.core.KFrame.ScalarFrameOps

/** Golden arithmetic/zip/append scenarios from the reference's own test
  * suite over its MSFT dataset (reference
  * tests/FSharp.DataFrame.Tests/Frame.fs:56-146) — the ranges not already
  * covered by MsftParitySpec/JoinLookupMatrixSpec/FinanceScenarioSpec.
  * Where the reference checks one position (GetAt 66), these check the
  * law on EVERY row (positions are file-order-dependent; whole-column
  * equality is the distributed-safe strengthening). */
class MsftGoldenOpsSpec extends SparkSpecBase {

  import spark.implicits._

  private val path = "/root/reference/tests/FSharp.DataFrame.Tests/data/MSFT.csv"

  private lazy val msft = spark.read
    .option("header", "true").option("inferSchema", "true").csv(path)

  private def kf = KFrame(msft, Seq("Date"))

  /** max |result.Open - expected| over all rows, joined on Date. */
  private def maxDiff(result: KFrame, expected: DataFrame): Double = {
    val j = result.df.select(col("Date"), col("Open").as("got"))
      .join(expected.select(col("Date"), col("e").as("want")), "Date")
    val row = j.agg(max(abs(col("got") - col("want"))).as("d"),
      count(lit(1)).as("n")).head
    assert(row.getLong(1) === 6527L, "join must cover every row")
    row.getDouble(0)
  }

  test("numerical operation leaves the non-numeric Date series intact (Frame.fs:56-59)") {
    val doubled = kf * 2.0
    // Date passes through mapNumeric untouched; first row (desc file order)
    // is 2012-01-27, as the reference asserts via GetAt(0)
    assert(doubled.df.schema("Date").dataType.typeName === "date")
    val first = doubled.df.orderBy(col("Date").desc).select("Date").head.getDate(0)
    assert(first.toString === "2012-01-27")
    assert(doubled.df.select("Date").except(msft.select("Date")).count() === 0)
    // and the numeric columns really doubled
    assert(maxDiff(doubled, msft.select(col("Date"), (col("Open") * 2.0).as("e"))) === 0.0)
  }

  test("scalar operations on frames, both operand orders (Frame.fs:62-80)") {
    val o = col("Open")
    val cases: Seq[(KFrame, org.apache.spark.sql.Column)] = Seq(
      (kf * 2.0, o * 2.0), (kf / 2.0, o / 2.0),
      (kf + 2.0, o + 2.0), (kf - 2.0, o - 2.0),
      (2.0 * kf, lit(2.0) * o), (2.0 + kf, lit(2.0) + o),
      (2.0 - kf, lit(2.0) - o), (2.0 / kf, lit(2.0) / o))
    cases.foreach { case (res, want) =>
      assert(maxDiff(res, msft.select(col("Date"), want.as("e"))) === 0.0)
    }
  }

  test("series operations on frames, both operand orders incl. int series (Frame.fs:84-106)") {
    val opens = kf.getSeries("Open")
    val o = col("Open")
    val cases: Seq[(KFrame, org.apache.spark.sql.Column)] = Seq(
      (kf.zipSeries(opens)(_ * _), o * o),
      (kf.zipSeries(opens)(_ / _), o / o),
      (kf.zipSeries(opens)(_ + _), o + o),
      (kf.zipSeries(opens)(_ - _), o - o),
      (kf.zipSeries(opens)((c, v) => v - c), o - o),
      (kf.zipSeries(opens)((c, v) => v / c), o / o))
    cases.foreach { case (res, want) =>
      assert(maxDiff(res, msft.select(col("Date"), want.as("e"))) === 0.0)
    }
    // int-converted series: frame doubles ⊙ int series promotes like the
    // reference's float conversion
    val intOpens = kf.getSeriesAs("Open", org.apache.spark.sql.types.IntegerType)
    val gotInt = kf.zipSeries(intOpens)(_ + _)
    val wantInt = msft.select(col("Date"), (o + o.cast("int")).as("e"))
    assert(maxDiff(gotInt, wantInt) === 0.0)
  }

  test("pointwise operations on two frames via whole-frame shift (Frame.fs:108-121)") {
    val df1 = kf.sortRows
    val df2 = df1.shift(1)
    val got = df2.zip(df1)((a, b) => a - b)
    // expected: lag(Open) - Open, checked wherever the lag exists (the
    // first row has no predecessor; frame.zip keeps the present side there)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("Date"))
    val expected = msft.select(col("Date"), (lag(col("Open"), 1).over(w) - col("Open")).as("e"))
      .where(col("e").isNotNull)
    val j = got.df.select(col("Date"), col("Open").as("got"))
      .join(expected.select(col("Date"), col("e").as("want")), "Date")
    val row = j.agg(max(abs(col("got") - col("want"))).as("d"), count(lit(1)).as("n")).head
    assert(row.getLong(1) === 6526L)
    assert(row.getDouble(0) === 0.0)
  }

  test("append two single-row frames whose keys differ in one level (Frame.fs:124-131)") {
    val df1 = KFrame(Seq((0, 0, "A")).toDF("k1", "k2", "A"), Seq("k1", "k2"))
    val df2 = KFrame(Seq((0, 1, "A")).toDF("k1", "k2", "A"), Seq("k1", "k2"))
    assert(df1.append(df2).df.select("k1", "k2").distinct().count() === 2L)
  }

  test("zip aligns row keys per join kind: inner/outer/left/right (Frame.fs:134-146)") {
    val df1 = KFrame(Seq((1, 1.0), (2, 2.0)).toDF("k", "A"), Seq("k"))
    val df2 = KFrame(Seq((2, 2.0), (3, 3.0)).toDF("k", "A"), Seq("k"))
    def keysOf(kind: JoinKind): Seq[Int] =
      df1.zip(df2, kind)(_ + _).df.select("k").collect().map(_.getInt(0)).toSeq.sorted
    assert(keysOf(JoinKind.Inner) === Seq(2))
    assert(keysOf(JoinKind.Outer) === Seq(1, 2, 3))
    assert(keysOf(JoinKind.Left) === Seq(1, 2))
    assert(keysOf(JoinKind.Right) === Seq(2, 3))
    // the one shared key combines with op
    val at2 = df1.zip(df2, JoinKind.Inner)(_ + _).df.where(col("k") === 2)
      .select("A").head.getDouble(0)
    assert(at2 === 4.0)
  }
}
