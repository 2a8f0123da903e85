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

  test("rejects non-long keys with a clear error") {
    import spark.implicits._
    val badLeft = Seq(("a", 1)).toDF("g", "x")
    intercept[IllegalArgumentException](
      AsOf.joinNative(badLeft, "g", data, "k", "v"))
  }
}
