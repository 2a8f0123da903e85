package graft

import org.apache.spark.sql.functions._

import graft.core.KSeries
import graft.sources.RangeSeriesSource

/** Ports the reference's DelayedSeries loader-spy tests (reference
  * tests/FSharp.DataFrame.Tests/LazySeries.fs:30-90): slicing a lazily
  * loaded series must narrow the range the loader materializes — here,
  * Catalyst pushdown into the DSv2 range source, observed through the
  * driver-side loads spy. */
class DelayedSourceSpec extends SparkSpecBase {

  private def read(spyKey: String) = spark.read
    .format("graft.sources.RangeSeriesSource")
    .option("lo", 0).option("hi", 1000000)
    .option("slices", 8).option("spy", spyKey)
    .load()

  test("between-slice narrows the loaded range (LazySeries.fs:30-60)") {
    val s = KSeries(read("t_between"), ordered = true)
      .between(lit(100L), lit(199L))
    assert(s.df.count() === 100L)
    val (lo, hi, _) = RangeSeriesSource.loads("t_between")
    assert(lo === 100L && hi === 200L,
      s"loader saw [$lo, $hi) — the slice did not push down")
  }

  test("exact-key lookup loads a single-key range") {
    val one = read("t_exact").where(col("k") === 424242L).collect()
    assert(one.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((424242L, 424242L * 0.5)))
    val (lo, hi, _) = RangeSeriesSource.loads("t_exact")
    assert(lo === 424242L && hi === 424243L)
  }

  test("column pruning reaches the loader") {
    val got = read("t_prune").select("k").agg(max(col("k"))).head.getLong(0)
    assert(got === 999999L)
    val (_, _, cols) = RangeSeriesSource.loads("t_prune")
    assert(cols === Seq("k"), s"loader materialized $cols — v was not pruned")
  }

  test("unfiltered read materializes the full declared range; residuals stay residual") {
    // v-predicates are NOT pushable: the loader sees the full range and
    // Spark re-applies the residual filter on top
    val n = read("t_full").where(col("v") > 100.0).count()
    assert(n === 1000000L - 201L)
    val (lo, hi, _) = RangeSeriesSource.loads("t_full")
    assert(lo === 0L && hi === 1000000L)
  }

  test("after a slice, aggregates run over the narrowed range only") {
    val s = read("t_agg").where(col("k") >= 10L && col("k") < 20L)
    assert(s.agg(sum(col("v"))).head.getDouble(0) === (10L until 20L).map(_ * 0.5).sum)
    val (lo, hi, _) = RangeSeriesSource.loads("t_agg")
    assert(lo === 10L && hi === 20L)
  }
}
