package graft

import org.apache.spark.sql.functions._
import org.apache.spark.SparkException

import graft.core._

/** Semantic laws of the reference's Series ported as unit tests
  * (reference tests/FSharp.DataFrame.Tests/Series.fs). */
class KSeriesSpec extends SparkSpecBase {

  private def s(rows: (Long, java.lang.Double)*): KSeries =
    KSeries(seriesDf(rows: _*), ordered = true)

  test("mapValues propagates missing (reference Series.fs:259-270)") {
    val r = s((1L, 1.0), (2L, null), (3L, 3.0)).mapValues(_ * 10)
    assert(collectKV(r.df) === Seq((1L, Some(10.0)), (2L, None), (3L, Some(30.0))))
  }

  test("filter sees only present values; filterAll sees missing") {
    val in = s((1L, 1.0), (2L, null), (3L, 3.0))
    assert(collectKV(in.filter((_, v) => v > 0).df) ===
      Seq((1L, Some(1.0)), (3L, Some(3.0))))
    assert(collectKV(in.filterAll((k, _) => k > 1).df) ===
      Seq((2L, None), (3L, Some(3.0))))
  }

  test("slicing with inexact keys below/inside/above the range (reference tests Series.fs:258-266)") {
    val sr = s((2L, 2.0), (4L, 4.0), (6L, 6.0))
    // bounds that are not keys slice as a range, exactly like the reference
    assert(collectKV(sr.between(lit(1L), lit(5L)).df) === Seq((2L, Some(2.0)), (4L, Some(4.0))))
    assert(collectKV(sr.between(lit(3L), lit(9L)).df) === Seq((4L, Some(4.0)), (6L, Some(6.0))))
    // bounds entirely out of range yield an empty series, not an error
    assert(collectKV(sr.between(lit(10L), lit(20L)).df) === Seq())
    assert(collectKV(sr.endAt(lit(1L)).df) === Seq())
    assert(collectKV(sr.startAt(lit(7L)).df) === Seq())
  }

  test("union PreferLeft / PreferRight (reference Series.fs:346-359)") {
    val a = s((1L, 1.0), (2L, 2.0))
    val b = s((2L, 20.0), (3L, 30.0))
    assert(collectKV(a.union(b, UnionBehavior.PreferLeft).df) ===
      Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(30.0))))
    assert(collectKV(a.union(b, UnionBehavior.PreferRight).df) ===
      Seq((1L, Some(1.0)), (2L, Some(20.0)), (3L, Some(30.0))))
  }

  test("union Exclusive raises on overlapping keys (reference VectorHelpers.fs:176-180)") {
    val a = s((1L, 1.0), (2L, 2.0))
    val b = s((2L, 20.0))
    val ex = intercept[Exception](a.union(b, UnionBehavior.Exclusive).df.collect())
    assert(ex.getMessage.contains("overlapping") ||
      ex.getCause != null && ex.getCause.getMessage.contains("overlapping"))
    // disjoint keys succeed
    val ok = a.union(s((3L, 30.0)), UnionBehavior.Exclusive)
    assert(collectKV(ok.df) === Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(30.0))))
  }

  test("append with duplicate check raises on colliding keys (reference Series.fs:293-300)") {
    val a = s((1L, 1.0), (2L, 2.0))
    intercept[Exception](a.append(s((2L, 9.0)), checkDuplicates = true).df.collect())
    assert(collectKV(a.append(s((3L, 3.0)), checkDuplicates = true).df) ===
      Seq((1L, Some(1.0)), (2L, Some(2.0)), (3L, Some(3.0))))
  }

  test("zipWith combines only where both present (reference SeriesModule.fs:1024-1034)") {
    val a = s((1L, 1.0), (2L, 2.0), (4L, 4.0))
    val b = s((2L, 20.0), (3L, 30.0), (4L, null))
    val r = a.zipWith(b, JoinKind.Outer)(_ + _)
    assert(collectKV(r.df) ===
      Seq((1L, None), (2L, Some(22.0)), (3L, None), (4L, None)))
  }

  test("fillForward / fillBackward (reference ArrayVector.fs:75-101)") {
    val in = s((1L, 1.0), (2L, null), (3L, null), (4L, 4.0), (5L, null))
    assert(collectKV(in.fillForward().df) ===
      Seq((1L, Some(1.0)), (2L, Some(1.0)), (3L, Some(1.0)), (4L, Some(4.0)), (5L, Some(4.0))))
    assert(collectKV(in.fillBackward().df) ===
      Seq((1L, Some(1.0)), (2L, Some(4.0)), (3L, Some(4.0)), (4L, Some(4.0)), (5L, None)))
  }

  test("lookup skips missing values (reference LinearIndex.fs:105-123)") {
    val in = s((1L, 1.0), (3L, null), (5L, 5.0))
    // NearestSmaller at 4: key 3 is nearest but missing → falls back to 1
    assert(collectKV(in.lookup(lit(4L), Lookup.NearestSmaller)) === Seq((1L, Some(1.0))))
    // NearestGreater at 2: key 3 missing → 5
    assert(collectKV(in.lookup(lit(2L), Lookup.NearestGreater)) === Seq((5L, Some(5.0))))
    // Exact at a missing key → empty
    assert(in.lookup(lit(3L), Lookup.Exact).count() === 0)
  }

  test("ordered-only ops reject unordered series (reference LinearIndex.fs:210-211)") {
    val un = KSeries(seriesDf((1L, 1.0)), ordered = false)
    intercept[IllegalArgumentException](un.between(lit(0L), lit(2L)))
    intercept[IllegalArgumentException](un.shift(1))
    intercept[IllegalArgumentException](un.diff(1))
    intercept[IllegalArgumentException](un.fillForward())
  }

  test("NaN canonicalized to missing on ingest (reference Common.fs:264-293)") {
    val withNan = seriesDf((1L, 1.0), (2L, Double.NaN), (3L, 3.0))
    val canon = Tables.canonical(withNan)
    assert(collectKV(canon) === Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0))))
    // and aggregates then skip it (null-skipping)
    val m = canon.agg(avg(col("v"))).head.getDouble(0)
    assert(m === 2.0)
  }

  test("computed NaN re-canonicalizes to missing (reference ArrayVector.fs:213-223)") {
    // sqrt of a negative inside a map or zip yields MISSING, not a NaN data
    // value — the reference re-normalizes at every vector construction
    val z = s((1L, -4.0), (2L, 4.0))
    val mapped = z.mapValues(v => sqrt(v))
    assert(collectKV(mapped.df) === Seq((1L, None), (2L, Some(2.0))))
    val zipped = s((1L, 1.0), (2L, 9.0)).zipWith(z, JoinKind.Outer)((a, b) => sqrt(a * b))
    assert(collectKV(zipped.df) === Seq((1L, None), (2L, Some(6.0))))
    // and aggregates then skip it
    assert(mapped.df.agg(avg(col("v"))).head.getDouble(0) === 2.0)
  }

  test("shift and diff are positional over key order (reference SeriesModule.fs:169-219)") {
    val in = s((1L, 10.0), (2L, 20.0), (3L, 40.0))
    assert(collectKV(in.shift(1).df) === Seq((1L, None), (2L, Some(10.0)), (3L, Some(20.0))))
    assert(collectKV(in.diff(1).df) === Seq((1L, None), (2L, Some(10.0)), (3L, Some(20.0))))
  }

  test("Series.diff works forward AND backward on the sample input (Series.fs:74-81)") {
    // reference: diff 2 keeps only 'c' => 2; diff -2 only 'a' => -2 —
    // comparing present observations (our SQL-natural form keeps the
    // missing-valued keys as nulls; the observations must agree)
    val in3 = s((1L, 1.0), (2L, 2.0), (3L, 3.0))
    def obs(x: KSeries) = collectKV(x.df).collect { case (k, Some(v)) => (k, v) }
    assert(obs(in3.diff(2)) === Seq((3L, 2.0)))
    assert(obs(in3.diff(-2)) === Seq((1L, -2.0)))
  }

  test("grouping a series with missing values drops all-missing groups (Series.fs:107-114)") {
    val n = s((0L, null), (1L, 1.0), (2L, null), (3L, 2.0))
    // reference Series.groupBy skips missing observations entirely: the
    // even group (both values missing) must not appear — dropMissing first
    val got = n.dropMissing.aggBy(k => pmod(k, lit(2)))((sum(col("v")), "s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got === Set((1L, 3.0)))
  }

  test("point lookups on the ordered string fixture (Series.fs:24-47)") {
    import spark.implicits._
    val df5 = Seq((1L, "hi"), (2L, "bye"), (3L, "ciao"), (5L, "nazdar")).toDF("k", "v")
    val s5 = KSeries(df5, ordered = true)
    assert(s5.lookup(lit(4), Lookup.NearestGreater).head.getString(1) === "nazdar")
    assert(s5.lookup(lit(4), Lookup.NearestSmaller).head.getString(1) === "ciao")
    assert(s5.lookup(lit(7), Lookup.Exact).isEmpty)
    // a missing value at the exact key is a miss, not a null hit (Series.fs:32-34)
    val m = KSeries(
      Seq((1L, "hi"), (3L, "ciao")).toDF("k", "v")
        .unionByName(Seq((2L, Option.empty[String].orNull)).toDF("k", "v")),
      ordered = true)
    assert(m.lookup(lit(2), Lookup.Exact).isEmpty)
  }

  test("approx quantile sketch stays within its rank-error bound of the exact form") {
    // uniform 0..n-1: rank error maps 1:1 to value error, so the
    // approx_percentile contract (rank error <= n/accuracy) is directly
    // checkable against exact percentile
    val n = 20000
    val in = KSeries(seriesDf((0 until n).map(i =>
      (i.toLong, Double.box(i.toDouble))): _*))
    val accuracy = 1000
    val tol = n.toDouble / accuracy + 1 // +1: interpolation of adjacent ranks
    val exactMed = in.exactMedian.head.getDouble(0)
    val approxMed = in.approxMedian(accuracy).head.getDouble(0)
    assert(math.abs(approxMed - exactMed) <= tol, s"median: $approxMed vs $exactMed")
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val exactQ = in.quantiles(probs).head
    val approxQ = in.approxQuantiles(probs, accuracy).head.getSeq[Double](0)
    probs.indices.foreach { i =>
      assert(math.abs(approxQ(i) - exactQ.getDouble(i)) <= tol,
        s"p=${probs(i)}: ${approxQ(i)} vs ${exactQ.getDouble(i)}")
    }
    // and the exact side is the true interpolated quantile
    assert(exactMed === (n - 1) / 2.0)
  }

  test("seriesEquals: same data equal, different data not (Series.fs equality tests)") {
    val a = KSeries(seriesDf((1L, Double.box(1.0)), (2L, Double.box(2.0)), (3L, null)))
    val b = KSeries(seriesDf((3L, null), (1L, Double.box(1.0)), (2L, Double.box(2.0))))
    val c = KSeries(seriesDf((1L, Double.box(1.0)), (2L, Double.box(2.5)), (3L, null)))
    val d = KSeries(seriesDf((1L, Double.box(1.0)), (2L, Double.box(2.0))))
    assert(a.seriesEquals(b), "order-independent equality (missing == missing)")
    assert(!a.seriesEquals(c), "different values")
    assert(!a.seriesEquals(d), "different key sets")
    // multiset semantics: a duplicated (k, v) row is NOT equal to a single one
    val dup = KSeries(seriesDf((1L, Double.box(1.0)), (1L, Double.box(1.0))))
    val single = KSeries(seriesDf((1L, Double.box(1.0))))
    assert(!dup.seriesEquals(single))
  }

  test("HLL distinct sketch stays within a few rsd of the exact count") {
    // 30k rows over exactly 4000 distinct values
    val nDistinct = 4000
    val in = KSeries(seriesDf((0 until 30000).map(i =>
      (i.toLong, Double.box((i % nDistinct).toDouble))): _*))
    val rsd = 0.02
    val est = in.approxCountValues(rsd).head.getLong(0)
    val relErr = math.abs(est.toDouble - nDistinct) / nDistinct
    assert(relErr <= 4 * rsd, s"HLL estimate $est vs $nDistinct (relErr $relErr)")
    // the exact twin is what parity tests must use
    assert(in.df.agg(org.apache.spark.sql.functions.countDistinct(
      org.apache.spark.sql.functions.col("v"))).head.getLong(0) === nDistinct)
  }
}
