package graft

import org.apache.spark.sql.functions._
import graft.operators.{Diff, Graphs, Stats, Dedup}

/** Hand-computed checks for the round-7 analytics pack: per-group OLS,
  * autocorrelation, drawdown (Stats), triangle census (Graphs), snapshot
  * diff (Diff), fuzzy entity pairs (Dedup.fuzzyBlockedPairs). The sf0.01
  * oracle queries (q190-q195) are the cross-engine gate; these specs pin
  * the arithmetic to values computed by hand.
  */
class AnalyticsSpec extends SparkSpecBase {
  import spark.implicits._

  test("olsByGroup: exact line recovers slope/intercept with r2=1") {
    // y = 2x + 3 exactly; second group y = -x + 10
    val df = Seq(
      ("a", 1L, 5L), ("a", 2L, 7L), ("a", 3L, 9L), ("a", 4L, 11L),
      ("b", 1L, 9L), ("b", 2L, 8L), ("b", 3L, 7L))
      .toDF("g", "x", "y")
    val out = Stats.olsByGroup(df, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("a") === ((4L, 2.0, 3.0, 1.0)))
    assert(out("b") === ((3L, -1.0, 10.0, 1.0)))
  }

  test("olsByGroup: imperfect fit matches hand-computed normal equations") {
    // points (0,0),(1,1),(2,1): n=3 sx=3 sy=2 sxy=3 sxx=5
    // cxy=3*3-3*2=3 cxx=3*5-9=6 slope=0.5 intercept=(2-0.5*3)/3=1/6
    // cyy=3*2-4=2 r2=9/(6*2)=0.75
    val df = Seq(("g", 0L, 0L), ("g", 1L, 1L), ("g", 2L, 1L)).toDF("g", "x", "y")
    val r = Stats.olsByGroup(df, "g", col("x"), col("y")).collect().head
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(r.getDouble(4) === 0.75)
  }

  test("acf: alternating series has lag-1 r = -1, lag-2 r = +1") {
    val s = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L), (5L, 2L))
      .toDF("k", "v")
    val out = Stats.acf(s, "k", col("v"), maxLag = 2, (k, l) => k - l)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1) === ((5L, -1.0)))
    assert(out(2) === ((4L, 1.0)))
  }

  test("drawdownSummary: hand-computed hwm/drawdown/peaks") {
    // key A values in order: 10,5,12,8,8 -> hwm 10,10,12,12,12
    // drawdowns 0,5,0,4,4 -> max 5; peaks where hwm==v: rows 1,3 -> 2
    val df = Seq(
      ("A", 1L, 1L, 10L), ("A", 2L, 2L, 5L), ("A", 3L, 3L, 12L),
      ("A", 4L, 4L, 8L), ("A", 5L, 5L, 8L),
      ("B", 1L, 1L, 3L), ("B", 2L, 2L, 4L))
      .toDF("g", "o", "id", "v")
    val out = Stats.drawdownSummary(df, "g", col("o"), col("id"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("A") === ((5L, 5L, 2L, 12L)))
    // monotone-up B: never below hwm -> max_drawdown 0, every row a peak
    assert(out("B") === ((2L, 0L, 2L, 4L)))
  }

  test("triangleCounts: two triangles sharing an edge; pendant excluded") {
    // triangles {1,2,3} and {2,3,4}; pendant edge 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val out = Graphs.triangleCounts(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("triangleCounts: duplicate and reversed input edges count once") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (2L, 3L), (2L, 3L))
      .toDF("id_a", "id_b")
    val out = Graphs.triangleCounts(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("snapshotDiff: all four statuses; null-position payloads differ") {
    val oldV = Seq(
      (1L, Option("x"), Option.empty[String]), // null position flips in v2
      (2L, Option("a"), Option("b")),          // unchanged
      (3L, Option("z"), Option("z"))           // removed
    ).toDF("k", "c1", "c2")
    val newV = Seq(
      (1L, Option.empty[String], Option("x")), // changed (null moved)
      (2L, Option("a"), Option("b")),
      (4L, Option("n"), Option("n"))           // added
    ).toDF("k", "c1", "c2")
    val out = Diff.snapshotDiff(oldV, newV, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "changed", 2L -> "unchanged",
      3L -> "removed", 4L -> "added"))
  }

  test("fuzzyBlockedPairs: distance filter and multiplicity product") {
    val df = Seq("kitten", "kitten", "kitten", "sitten", "sitten", "mitten",
      "apple").toDF("name")
    val out = Dedup.fuzzyBlockedPairs(df, "name", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    // kitten(3) x sitten(2), kitten(3) x mitten(1), mitten(1) x sitten(2)
    assert(out === Map(
      ("kitten", "sitten") -> ((1, 6L)),
      ("kitten", "mitten") -> ((1, 3L)),
      ("mitten", "sitten") -> ((1, 2L))))
  }

  // ----------------------------------------------------------------- gini

  test("giniConcentration: hand-computed quartile case and perfect equality") {
    // values 1,2,3,4: ws = 1+4+9+16 = 30; G = (60 - 5*10)/(4*10) = 0.25
    val df = Seq(("u1", 1L), ("u2", 2L), ("u3", 3L), ("u4", 4L)).toDF("u", "v")
    val r = Stats.giniConcentration(df, "u", col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 10L, 250000L)))
    // equal shares -> exactly 0
    val eq = Seq(("u1", 5L), ("u2", 5L), ("u3", 5L), ("u4", 5L)).toDF("u", "v")
    assert(Stats.giniConcentration(eq, "u", col("v"))
      .collect().head.getLong(2) === 0L)
  }

  test("giniConcentration: per-unit rows aggregate before ranking") {
    // u1 = 1+3 = 4, u2 = 2: same as units (4, 2): n=2 tot=6 ws=2*1+4*2=10
    // G = (20 - 3*6)/(2*6) = 2/12 -> 166666 ppm (truncating DIV)
    val df = Seq(("u1", 1L), ("u1", 3L), ("u2", 2L)).toDF("u", "v")
    val r = Stats.giniConcentration(df, "u", col("v")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 6L, 166666L)))
  }

  // ---------------------------------------------------------------- cusum

  test("cusumChangePoint: level shift found, earliest-key tie-break") {
    // x = [1,1,5,1]: prefixes [1,2,7,8]; |4p - k*8| = [4,8,4,0] -> k=2
    val df = Seq((1L, 1L), (2L, 1L), (3L, 5L), (4L, 1L)).toDF("k", "x")
    val r = Stats.cusumChangePoint(df, col("k"), col("x")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 8L, 2L, 8L)))
    // ties at k=1 and k=3 -> earliest wins
    val tie = Seq((1L, 2L), (2L, 0L), (3L, 2L), (4L, 0L)).toDF("k", "x")
    val rt = Stats.cusumChangePoint(tie, col("k"), col("x")).collect().head
    assert((rt.getLong(2), rt.getLong(3)) === ((1L, 4L)))
  }

  // ---------------------------------------------------------- mad outliers

  test("madOutliers: hand-computed median/MAD and census") {
    // [1,2,3,4,100]: med=3 -> med2=6; d2=[4,2,0,2,194] -> mad4=4;
    // outliers: 2*d2 > 12 -> only 194
    val df = Seq(1L, 2L, 3L, 4L, 100L).map(("g", _)).toDF("g", "v")
    val r = Stats.madOutliers(df, "g", col("v"), k = 3).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((5L, 6L, 4L, 1L)))
  }

  test("madOutliers: even count interpolates; zero MAD flags any deviation") {
    // [1,3]: med=2 -> med2=4; d2=[2,2] -> mad4=4; no outliers (4 > 12 false)
    // [5,5,5,9]: med=5 med2=10; d2=[0,0,0,8] mad4=0; 2*8 > 0 -> 1 outlier
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 5L), ("b", 5L), ("b", 9L))
      .toDF("g", "v")
    val out = Stats.madOutliers(df, "g", col("v"), k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("a") === ((2L, 4L, 4L, 0L)))
    assert(out("b") === ((4L, 10L, 0L, 1L)))
  }

  // --------------------------------------------------------- rolling corr

  test("rollingCorr: perfect co-movement +-1, single-point and flat null") {
    val df = Seq(
      ("up", 1L, 1L, 2L), ("up", 2L, 2L, 4L), ("up", 3L, 3L, 6L),
      ("dn", 1L, 1L, 6L), ("dn", 2L, 2L, 4L), ("dn", 3L, 3L, 2L),
      ("fl", 1L, 1L, 7L), ("fl", 2L, 1L, 9L))
      .toDF("g", "k", "x", "y")
    val out = Stats.rollingCorr(df, "g", col("k"), col("x"), col("y"), win = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(("up", 1L)) === ((1L, None)))       // nw=1: zero variance
    assert(out(("up", 2L)) === ((2L, Some(1.0))))
    assert(out(("up", 3L)) === ((3L, Some(1.0))))
    assert(out(("dn", 3L)) === ((3L, Some(-1.0))))
    assert(out(("fl", 2L)) === ((2L, None)))       // x flat: vx=0 -> null
  }

  test("rollingCorr: raw rows aggregate to the (group, key) series first") {
    // two rows on day 1 collapse to x=2, y=10; day 2 x=1 y=1:
    // corr over [(2,10),(1,1)] = +1
    val df = Seq(("g", 1L, 1L, 4L), ("g", 1L, 1L, 6L), ("g", 2L, 1L, 1L))
      .toDF("g", "k", "x", "y")
    val out = Stats.rollingCorr(df, "g", col("k"), col("x"), col("y"), win = 7)
      .collect().map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(out(2L) === Some(1.0))
  }

  // ------------------------------------------------------- conversion lag

  test("conversionLag: strictly-after semantics, quarter quantiles x4") {
    import java.sql.Timestamp
    def at(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      (1L, at(0), "view"), (1L, at(10), "purchase"),
      (2L, at(0), "view"), (2L, at(20), "purchase"),
      (3L, at(0), "purchase"),                     // no view: excluded
      (4L, at(0), "view"),                         // no purchase: excluded
      (5L, at(5), "purchase"), (5L, at(9), "view")) // purchase BEFORE view
      .toDF("u", "t", "e")
    val r = graft.operators.Events
      .conversionLag(ev, "u", "t", "view", "purchase", "e").collect().head
    // delays [10, 20]: p25 = 12.5 -> 50; p50 = 15 -> 60; p75 = 17.5 -> 70
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((2L, 50L, 60L, 70L, 20L, 15L)))
  }

  // -------------------------------------------------------- vocab overlap

  test("vocabOverlap: distinct token sets, shared-token pairs only") {
    val docs = Seq(
      ("A", "a b c"), ("A", "a a"),   // A = {a,b,c}
      ("B", "b  c d"),                // B = {b,c,d} (double space -> "" dropped)
      ("C", "x"))                     // C disjoint
      .toDF("source", "text")
    val out = graft.functions.Text.vocabOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out === Map(("A", "B") -> ((2L, 3L, 3L, 500000L))))
  }

  test("kCore: peel cascades — pendant chain unravels, dense core survives") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node degree 3) + a chain 4-5-6: node 6 has
    // degree 1 → peeled; THEN node 5 drops to degree 1 → peeled (the
    // cascade a single-pass degree filter would miss)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("id_a", "id_b")
    val core2 = Graphs.kCore(edges, "id_a", "id_b", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(core2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val core4 = Graphs.kCore(edges, "id_a", "id_b", k = 4)
    assert(core4.count() === 0) // K4 max degree is 3 — whole graph peels
  }
}
