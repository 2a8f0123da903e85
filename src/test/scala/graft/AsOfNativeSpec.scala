package graft

import org.apache.spark.sql.functions._

import graft.core.Lookup
import graft.operators.AsOf

/** The native AsOfJoinExec must plan as a first-class operator, preserve the
  * probe partitioning, and agree with the window-based as-of join. */
class AsOfNativeSpec extends SparkSpecBase {

  private val data = seriesDf((1L, 10.0), (3L, null), (5L, 50.0))

  private def probes(ks: Long*) =
    seriesDf(ks.map(k => (k, null: java.lang.Double)): _*).select(col("k").as("g"))

  test("plans an AsOfJoinExec node") {
    val df = AsOf.joinNative(probes(2L, 4L), "g", data, "k", "v")
    assert(df.queryExecution.executedPlan.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]),
      s"plan:\n${df.queryExecution.executedPlan}")
  }

  test("agrees with the window as-of join in both directions, incl. fill-through-missing") {
    val p = probes(0L, 2L, 3L, 4L, 5L, 6L)
    for (dir <- Seq(Lookup.NearestSmaller, Lookup.NearestGreater)) {
      val native = collectKV(AsOf.joinNative(p, "g", data, "k", "v", dir), "g", "v")
      val window = collectKV(AsOf.join(p, "g", data, "k", Seq("v"), dir), "g", "v")
      assert(native === window, s"dir=$dir")
    }
  }

  test("probe-side columns and partitioning survive") {
    import spark.implicits._
    val left = Seq((2L, "x"), (5L, "y")).toDF("g", "tag").repartition(3, col("tag"))
    val df = AsOf.joinNative(left, "g", data, "k", "v")
    assert(df.columns.toSeq === Seq("g", "tag", "v"))
    assert(df.rdd.getNumPartitions === 3)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got === Set((2L, "x", Some(10.0)), (5L, "y", Some(50.0))))
  }

  test("rejects unsupported keys with a clear error") {
    import spark.implicits._
    val badLeft = Seq(("a", 1)).toDF("g", "x")
    intercept[IllegalArgumentException](
      AsOf.joinNative(badLeft, "g", data, "k", "v"))
  }

  test("multiple value columns of mixed types carried, each filled independently") {
    import spark.implicits._
    val rich = Seq(
      (1L, Some(10.0), Some("a"), Some(100L)),
      (3L, None, Some("b"), None),
      (5L, Some(50.0), None, Some(500L)))
      .toDF("k", "v", "s", "n")
    val p = probes(2L, 4L, 6L)
    val got = AsOf.joinNative(p, "g", rich, "k", Seq("v", "s", "n"), Lookup.NearestSmaller)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    // at 4: v fills through missing k=3 back to 10.0; s takes "b"; n fills to 100
    assert(got === Set(
      (2L, Some(10.0), Some("a"), Some(100L)),
      (4L, Some(10.0), Some("b"), Some(100L)),
      (6L, Some(50.0), Some("b"), Some(500L))))
    // and agrees with the window form per column
    val window = AsOf.join(p, "g", rich, "k", Seq("v", "s", "n"), Lookup.NearestSmaller)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got === window)
  }

  test("date keys binary-search correctly") {
    import spark.implicits._
    val d = java.sql.Date.valueOf(_: String)
    val quotes = Seq((d("2024-01-01"), 1.0), (d("2024-02-01"), 2.0))
      .toDF("day", "px")
    val p = Seq(d("2024-01-15"), d("2024-02-15"), d("2023-12-15"))
      .toDF("day")
    val got = AsOf.joinNative(p, "day", quotes, "day", Seq("px"), Lookup.NearestSmaller)
      .collect().map(r => (r.getDate(0).toString,
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(got === Set(
      ("2024-01-15", Some(1.0)), ("2024-02-15", Some(2.0)), ("2023-12-15", None)))
    // mixed key types rejected
    val badProbe = Seq(1L).toDF("day")
    intercept[IllegalArgumentException](
      AsOf.joinNative(badProbe, "day", quotes, "day", Seq("px"), Lookup.NearestSmaller))
  }
}
