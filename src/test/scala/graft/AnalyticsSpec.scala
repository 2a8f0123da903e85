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
}
