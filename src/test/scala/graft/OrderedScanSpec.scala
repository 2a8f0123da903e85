package graft

import org.apache.spark.sql.functions._

import graft.operators.OrderedScan

/** The distributed two-level scan must agree exactly with the single-window
  * form on every input. */
class OrderedScanSpec extends SparkSpecBase {

  import spark.implicits._

  // enough rows that multiple buckets actually form
  private val n = 500
  private def input = {
    val rows = (0 until n).map { i =>
      (i.toLong, if (i % 7 == 0) Some(i.toDouble) else None)
    }
    rows.map { case (k, v) => (k, v.map(Double.box).orNull) }
  }

  test("forwardFill matches the single-window reference on 500 rows / 8 buckets") {
    val df = seriesDf(input: _*)
    val got = collectKV(OrderedScan.forwardFill(df, "k", Seq("v"), buckets = 8))
    val expect = (0 until n).map(i => (i.toLong, Some((i / 7 * 7).toDouble)))
    assert(got === expect)
  }

  test("runningSum matches a sequential prefix sum") {
    val df = (0 until n).map(i => (i.toLong, 1.0)).toDF("k", "v")
    val got = OrderedScan.runningSum(df, "k", "v", "cum", buckets = 8)
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val expect = (0 until n).map(i => (i.toLong, (i + 1).toDouble))
    assert(got.toSeq === expect)
  }

  test("rowNumber is a global 0..n-1 ordinal in key order") {
    val df = (0 until n).reverse.map(i => (i.toLong * 3, s"r$i")).toDF("k", "tag")
    val got = OrderedScan.rowNumber(df, "k", "ord", buckets = 8)
      .select("k", "ord").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    got.zipWithIndex.foreach { case ((_, ord), i) => assert(ord === i.toLong) }
  }

  test("forwardFill: leading all-null bucket carries nothing (stays null)") {
    val df = seriesDf((0 until 100).map(i =>
      (i.toLong, if (i >= 50) Double.box(i.toDouble) else null)): _*)
    val got = collectKV(OrderedScan.forwardFill(df, "k", Seq("v"), buckets = 4))
    assert(got.take(50).forall(_._2.isEmpty))
    assert(got.drop(50).zipWithIndex.forall { case ((_, v), i) => v.contains((i + 50).toDouble) })
  }
}
