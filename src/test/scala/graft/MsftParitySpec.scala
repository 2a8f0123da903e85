package graft

import org.apache.spark.sql.functions._

import graft.core.{JoinKind, KFrame, KSeries}
import graft.operators.{Boundary, Windowing}

/** End-to-end parity on the reference's own golden dataset
  * (MSFT.csv, 6527 rows × 7 cols — reference
  * tests/FSharp.DataFrame.Tests/Frame.fs:22-49,107-170,308-314).
  * The data file is read from the reference checkout; only data, no code. */
class MsftParitySpec extends SparkSpecBase {

  private val path = "/root/reference/tests/FSharp.DataFrame.Tests/data/MSFT.csv"

  private lazy val msft = spark.read
    .option("header", "true").option("inferSchema", "true").csv(path)

  test("CSV inference: 6527 rows, 7 columns, typed like the reference (Frame.fs:26-30)") {
    assert(msft.count() === 6527)
    assert(msft.columns.length === 7)
    assert(msft.columns.contains("Adj Close")) // header with a space survives
    val types = msft.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("Date") === "date" || types("Date") === "timestamp")
    assert(types("Open") === "double")
    assert(types("Volume") === "integer" || types("Volume") === "long")
  }

  test("CSV round-trip identity (Frame.fs:32-49)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_msft").toString + "/out"
    msft.write.option("header", "true").mode("overwrite").csv(tmp)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(tmp)
    assert(back.count() === msft.count())
    val a = msft.agg(round(sum(col("Open")), 4), round(sum(col("`Adj Close`")), 4)).head
    val b = back.agg(round(sum(col("Open")), 4), round(sum(col("`Adj Close`")), 4)).head
    assert(a === b)
  }

  test("zip self-subtraction is zero (operator law, Frame.fs:147-170)") {
    val f = KFrame(msft.select(col("Date").as("k"), col("Open"), col("Close")), Seq("k"))
    val z = f.zip(f)(_ - _)
    val nonZero = z.df.where(abs(col("Open")) > 1e-9 || abs(col("Close")) > 1e-9).count()
    assert(nonZero === 0)
  }

  test("series zip outer-align arithmetic over date index (Series ops on real dates)") {
    val open = KSeries(msft.select(col("Date").as("k"), col("Open").as("v")), ordered = true)
    val close = KSeries(msft.select(col("Date").as("k"), col("Close").as("v")), ordered = true)
    val spread = close.zipWith(open, JoinKind.Outer)(_ - _)
    assert(spread.df.count() === 6527)
    // every date present on both sides → no missing results
    assert(spread.dropMissing.df.count() === 6527)
  }

  test("ordered analytics on the date index: shift/diff/window (Frame.fs:308-314)") {
    val close = KSeries(msft.select(col("Date").as("k"), col("Close").as("v")), ordered = true)
    // diff(1) = close - lag(close): verify against a hand computation on
    // the first 3 trading days
    val first3 = msft.orderBy("Date").limit(3)
      .select(col("Close")).collect().map(_.getDouble(0))
    val d = close.diff(1).df.orderBy("k").limit(3)
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(d(0) === None)
    assert(math.abs(d(1).get - (first3(1) - first3(0))) < 1e-9)
    assert(math.abs(d(2).get - (first3(2) - first3(1))) < 1e-9)

    val ma = Windowing.windowInto(close, 20, Boundary.Skip)(avg)
    assert(ma.count() === 6527 - 19)
  }
}
