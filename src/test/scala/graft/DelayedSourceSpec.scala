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

  // ---- randomized range algebra (LazySeries.fs:104-133 ported) ----
  //
  // The reference generates random Union/Intersect trees of
  // inclusive/exclusive ranges and checks Ranges.flattenRanges against
  // pointwise Ranges.contains. The Spark analog: the same random trees
  // rendered as boolean predicates over the lazy source, where "flatten"
  // is the ScanBuilder's conjunct narrowing. Checked per tree:
  //   (1) row membership == pointwise containment (exact semantics);
  //   (2) the loader-materialized range covers every satisfying key
  //       (narrowing is SOUND — pushdown never loses data);
  //   (3) the loader range is within the envelope the top-level
  //       conjuncts imply (narrowing is COMPLETE — everything that can
  //       be pushed declaratively was; Catalyst may do better still by
  //       factoring shared conjuncts out of ORs, hence ⊆ not ==).
  // Same seeded-generator discipline as the reference's FsCheck seeds
  // (the scalatest/scalacheck bridge is not in the offline cache).

  private sealed trait RangeExpr
  private case class RLeaf(lo: Long, loInc: Boolean, hi: Long, hiInc: Boolean)
      extends RangeExpr
  private case class RUnion(a: RangeExpr, b: RangeExpr) extends RangeExpr
  private case class RIntersect(a: RangeExpr, b: RangeExpr) extends RangeExpr

  // the reference's randomRanges recursion verbatim (LazySeries.fs:105-117):
  // mid/midl/midr splits, 1/5 union, 1/5 intersect, else a leaf range with
  // random boundary behaviors (equal-endpoint leaves share one behavior)
  private def randomRanges(rnd: java.util.Random, lo: Long, hi: Long): RangeExpr = {
    val mid = lo + rnd.nextInt((hi - lo + 1).toInt)
    val midl = lo + rnd.nextInt((mid - lo + 1).toInt)
    val midr = mid + rnd.nextInt((hi - mid + 1).toInt)
    rnd.nextInt(5) match {
      case 0 => RUnion(randomRanges(rnd, midl, mid), randomRanges(rnd, mid, midr))
      case 1 => RIntersect(randomRanges(rnd, lo, midr), randomRanges(rnd, midl, hi))
      case _ =>
        def beh() = rnd.nextInt(2) == 0
        if (lo == hi) { val b = beh(); RLeaf(lo, b, hi, b) }
        else RLeaf(lo, beh(), hi, beh())
    }
  }

  private def rContains(x: Long, e: RangeExpr): Boolean = e match {
    case RLeaf(lo, loInc, hi, hiInc) =>
      (x > lo && x < hi) || (x == lo && loInc) || (x == hi && hiInc)
    case RUnion(a, b)     => rContains(x, a) || rContains(x, b)
    case RIntersect(a, b) => rContains(x, a) && rContains(x, b)
  }

  private def rPred(e: RangeExpr): org.apache.spark.sql.Column = e match {
    case RLeaf(lo, loInc, hi, hiInc) =>
      val lp = if (loInc) col("k") >= lit(lo) else col("k") > lit(lo)
      val hp = if (hiInc) col("k") <= lit(hi) else col("k") < lit(hi)
      lp && hp
    case RUnion(a, b)     => rPred(a) || rPred(b)
    case RIntersect(a, b) => rPred(a) && rPred(b)
  }

  // [lo, hi)-envelope the top-level conjuncts imply: leaves narrow, ORs
  // are residual (the builder narrows only on simple k-comparisons)
  private def rEnvelope(e: RangeExpr): (Long, Long) = e match {
    case RLeaf(lo, loInc, hi, hiInc) =>
      (if (loInc) lo else lo + 1, if (hiInc) hi + 1 else hi)
    case RIntersect(a, b) =>
      val (l1, h1) = rEnvelope(a); val (l2, h2) = rEnvelope(b)
      (math.max(l1, l2), math.min(h1, h2))
    case RUnion(_, _) => (0L, 101L)
  }

  test("random union/intersect range trees: membership, sound + complete pushdown (LazySeries.fs:104-133)") {
    for (seed <- 1 to 100) {
      val e = randomRanges(new java.util.Random(seed), 0L, 100L)
      val spy = s"t_alg_$seed"
      val got = spark.read.format("graft.sources.RangeSeriesSource")
        .option("lo", 0).option("hi", 101)
        .option("slices", 3).option("spy", spy)
        .load().where(rPred(e))
        .select("k").collect().map(_.getLong(0)).toSet
      val want = (0L to 100L).filter(x => rContains(x, e)).toSet
      assert(got === want, s"seed=$seed expr=$e")
      RangeSeriesSource.loads.get(spy) match {
        case Some((llo, lhi, _)) =>
          if (want.nonEmpty)
            assert(llo <= want.min && want.max < lhi,
              s"seed=$seed loader [$llo,$lhi) lost satisfying keys ($e)")
          val (elo, ehi) = rEnvelope(e)
          if (elo < ehi)
            assert(llo >= elo && lhi <= ehi,
              s"seed=$seed loader [$llo,$lhi) wider than conjunct envelope [$elo,$ehi) ($e)")
          else
            assert(lhi - llo <= 0,
              s"seed=$seed empty conjunct envelope but loader read [$llo,$lhi) ($e)")
        case None =>
          // Catalyst eliminated the scan outright (provably-empty plan):
          // legal only when nothing satisfies the predicate
          assert(want.isEmpty, s"seed=$seed scan never planned but rows expected ($e)")
      }
    }
  }
}
