package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Events, OrderedScan, Stats}

/** Hand-computed checks for the event-analytics pack (funnel, cohort
  * retention, Markov transitions, last-touch attribution), the KS drift
  * statistic, the containment / sorted-neighborhood dedup blockers, and
  * the fused multi-column prefix-sum they ride. The sf0.01 oracle queries
  * (q196-q202) are the cross-engine gate; these specs pin semantics the
  * oracle can't isolate (ordering enforcement, horizon edges, window
  * misses).
  */
class EventsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // -------------------------------------------------------------- funnel

  test("funnel: steps must occur in order, strictly after the previous") {
    // u1 completes in order; u2 has the click BEFORE its first view (the
    // out-of-order trap — must stop at step 1); u3 stops after click;
    // u4 never views (reaches nothing).
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "buy"),
      (2L, "2024-01-01 09:00:00", "click"),
      (2L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 10:30:00", "click"),
      (4L, "2024-01-01 11:00:00", "click"),
      (4L, "2024-01-01 11:30:00", "buy"))
      .map { case (u, t, e) => (u, ts(t), e) }
      .toDF("u", "t", "e")
    val out = Events.funnel(ev, "u", "t", "e", Seq("view", "click", "buy"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1) === (("view", 3L, 1000000L)))
    assert(out(2) === (("click", 2L, 666666L)))
    assert(out(3) === (("buy", 1L, 333333L)))
  }

  test("funnel: step time ties do NOT advance (strictly-after semantics)") {
    // click at the SAME instant as the first view must not count
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click"))
      .toDF("u", "t", "e")
    val out = Events.funnel(ev, "u", "t", "e", Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(out(1) === 1L && out(2) === 0L)
  }

  // ---------------------------------------------------- cohort retention

  test("cohortRetention: offsets are whole weeks from the Monday cohort") {
    // u1 first event Wed Jan 3 2024 (cohort Mon Jan 1), active again the
    // next Tuesday (offset 1) and 15 days later (offset 2);
    // u2 first event Mon Jan 8 (cohort Jan 8), active only that week.
    val ev = Seq(
      (1L, "2024-01-03 12:00:00"), (1L, "2024-01-09 08:00:00"),
      (1L, "2024-01-18 23:00:00"),
      (2L, "2024-01-08 00:00:00"), (2L, "2024-01-14 23:59:59"))
      .map { case (u, t) => (u, ts(t)) }.toDF("u", "t")
    val out = Events.cohortRetention(ev, "u", "t")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 1L, ("2024-01-01", 1L) -> 1L,
      ("2024-01-01", 2L) -> 1L, ("2024-01-08", 0L) -> 1L))
  }

  // -------------------------------------------------- markov transitions

  test("markovTransitions: per-entity ordered pairs, row-conditional ppm") {
    // u1: a->b->a ; u2: a->b  =>  from a: b twice (1e6 ppm);
    // from b: a once (1e6 ppm); no cross-entity pair (u1 last -> u2 first)
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 4L, "a"), (2L, 5L, "b"))
      .map { case (u, i, e) => (u, ts(s"2024-01-01 10:0$i:00"), i, e) }
      .toDF("u", "t", "id", "e")
    val out = Events.markovTransitions(ev, "u", "t", "id", "e")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      ("a", "b") -> ((2L, 1000000L)),
      ("b", "a") -> ((1L, 1000000L))))
  }

  test("markovTransitions: equal timestamps break ties on the id column") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq((1L, t0, 2L, "b"), (1L, t0, 1L, "a"), (1L, t0, 3L, "c"))
      .toDF("u", "t", "id", "e")
    val out = Events.markovTransitions(ev, "u", "t", "id", "e")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("a", "b"), ("b", "c")))
  }

  // ------------------------------------------------ last-touch attribution

  test("lastTouchAttribution: latest prior touch wins; horizon excludes") {
    // p1: view then click before it -> credited to click (the LATEST).
    // p2: only touch is 10 days earlier -> outside 7-day horizon, (none).
    // p3: no touch at all -> (none).
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (1L, "2024-01-01 11:00:00", 2L, "click", 0.0),
      (1L, "2024-01-01 12:00:00", 3L, "purchase", 10.0),
      (2L, "2024-01-01 00:00:00", 4L, "view", 0.0),
      (2L, "2024-01-11 00:00:00", 5L, "purchase", 5.0),
      (3L, "2024-01-02 09:00:00", 6L, "purchase", 2.5))
      .map { case (u, t, i, e, v) => (u, ts(t), i, e, v) }
      .toDF("u", "t", "id", "e", "v")
    val out = Events.lastTouchAttribution(ev, "u", "t", "id", "e", "v",
        Seq("view", "click"), "purchase", horizonSec = 7L * 86400L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("click") === ((1L, 1000L, 3600L)))
    assert(out("(none)") === ((2L, 750L, 0L)))
    assert(!out.contains("view"))
  }

  test("lastTouchAttribution: touch exactly AT the horizon still counts") {
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 0.0),
      (1L, "2024-01-08 00:00:00", 2L, "purchase", 1.0))
      .map { case (u, t, i, e, v) => (u, ts(t), i, e, v) }
      .toDF("u", "t", "id", "e", "v")
    val out = Events.lastTouchAttribution(ev, "u", "t", "id", "e", "v",
        Seq("view", "click"), "purchase", horizonSec = 7L * 86400L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view" -> 1L))
  }

  // ------------------------------------------------------------ KS drift

  test("ksDrift: hand-computed two-sample ECDF supremum") {
    // cohort A values: 1,2,3 ; cohort B: 2,3,3,4
    // at v=1: r1=1,r2=0 -> |1*4-0*3|=4 ; v=2: r1=2,r2=1 -> 5
    // v=3: r1=3,r2=3 -> 3 ; v=4: r1=3,r2=4 -> 0  => D = 5/12
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 3L), ("b", 4L)).toDF("g", "v")
    val r = Stats.ksDrift(df, col("v"), col("g") === "a", col("g") === "b")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 4L, 5L)))
    assert(r.getLong(3) === 5L * 1000000L / 12L)
  }

  test("ksDrift: identical distributions have D = 0") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val r = Stats.ksDrift(df, col("v"), col("g") === "a", col("g") === "b")
      .collect().head
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
  }

  // --------------------------------------------------- containment pairs

  test("containmentPairs: doc-in-doc found at high containment, low Jaccard") {
    // d2 (4 tokens) fully inside d1 (12 tokens): containment 1.0 but
    // Jaccard = 4/12 = 0.33 — the pair Jaccard-at-0.5 misses.
    val big = "alpha beta gamma delta eps zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, big), (2L, "gamma delta eps zeta"), (3L, "nu xi omicron pi"))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(docs, "id", "text", 900000L, maxDf = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(out === Map((1L, 2L) -> 1000000L))
    val jac = Dedup.tokenJaccardPairs(docs, "id", "text", 0.5).count()
    assert(jac === 0L)
  }

  test("containmentPairs: tokens above the df cap generate no candidates") {
    // the only shared token appears in all 3 docs; with maxDf=2 it is
    // blocked, so no pair survives (documented recall trade)
    val docs = Seq((1L, "common a b"), (2L, "common c d"), (3L, "common e f"))
      .toDF("id", "text")
    val out = Dedup.containmentPairs(docs, "id", "text", 1L, maxDf = 2L)
    assert(out.count() === 0L)
  }

  // ------------------------------------------------- sorted neighborhood

  test("sortedNeighborhoodPairs: close ranks pair, far ranks don't") {
    // domain sorted: aaaa, aaab, aaac, zzzz; window 2 pairs the a* family;
    // zzzz is within rank-window of aaac but fails the edit distance
    val df = Seq("aaaa", "aaab", "aaab", "aaac", "zzzz").toDF("v")
    val out = Dedup.sortedNeighborhoodPairs(df, "v", window = 2, maxDist = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getInt(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      ("aaaa", "aaab") -> ((1, 2L)),
      ("aaab", "aaac") -> ((1, 2L)),
      ("aaaa", "aaac") -> ((1, 1L))))
  }

  test("sortedNeighborhoodPairs: window 1 compares only adjacent ranks") {
    val df = Seq("aaaa", "aaab", "aaac").toDF("v")
    val out = Dedup.sortedNeighborhoodPairs(df, "v", window = 1, maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // (aaaa, aaac) is rank distance 2 — outside the window even though
    // its edit distance (2) passes
    assert(out === Set(("aaaa", "aaab"), ("aaab", "aaac")))
  }

  // -------------------------------------------------------- path counts

  test("pathCounts: first-k prefixes, id tie-break, short entities kept") {
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq(
      // u1: a,b,c,d -> a>b>c ; u2: only a,b -> a>b
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "c"),
      (1L, ts("2024-01-01 10:03:00"), 4L, "d"),
      (2L, ts("2024-01-01 11:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 11:01:00"), 6L, "b"),
      // u3: all three at the SAME instant -> id order decides a>b>c
      (3L, t0, 8L, "b"), (3L, t0, 7L, "a"), (3L, t0, 9L, "c"))
      .toDF("u", "t", "id", "e")
    val out = Events.pathCounts(ev, "u", "t", "id", "e", k = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a>b>c" -> 2L, "a>b" -> 1L))
  }

  // ------------------------------------------------------ survival curve

  test("survivalCurve: exact lifespan weeks, dense offsets, ppm") {
    val ev = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-10 09:00:00"),
      (1L, "2024-01-22 23:00:00"), // 21 days -> 3 whole weeks
      (2L, "2024-01-01 00:00:00")) // single event -> lifespan 0
      .map { case (u, t) => (u, ts(t)) }.toDF("u", "t")
    val out = Events.survivalCurve(ev, "u", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      0L -> ((2L, 1000000L)), 1L -> ((1L, 500000L)),
      2L -> ((1L, 500000L)), 3L -> ((1L, 500000L))))
  }

  // ------------------------------------------------------------- benford

  test("benfordDeviation: hand-computed digits, sub-1 values excluded") {
    val df = Seq(1.5, 19.0, 23.0, 0.5, 9.0).toDF("v")
    val out = Stats.benfordDeviation(df, col("v"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out === Map(
      1 -> ((2L, 500000L, 301030L, 198970L)),
      2 -> ((1L, 250000L, 176091L, 73909L)),
      9 -> ((1L, 250000L, 45757L, 204243L))))
  }

  test("benfordDeviation: expectation ppm constants sum to exactly 1e6") {
    assert(Stats.benfordPpm.map(_._2).sum === 1000000L)
  }

  // ------------------------------------------------------------- A/B lift

  test("abLift: hand-computed two-proportion z") {
    // arm1 = even users {2,4}: 1 of 2 converts; arm2 {1,3}: 2 of 2
    val df = Seq(
      (1L, "buy"), (1L, "x"), (2L, "buy"), (3L, "buy"), (4L, "x"))
      .toDF("u", "e")
    val r = Stats.abLift(df, "u", col("u") % 2 === 0, col("e") === "buy")
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 2L, 2L)))
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) ===
      ((500000L, 1000000L, -500000L)))
    // z = (0.5 - 1) / sqrt(0.75 * 0.25 * (0.5 + 0.5)) = -1.1547005...
    assert(r.getDouble(7) === -1.154701)
  }

  // ------------------------------------------- fused multi-column prefix

  test("runningSumsLong: fused pass matches two runningSum passes") {
    val df = (1L to 200L).map(k => (k, k % 7, k % 5)).toDF("k", "a", "b")
    val fused = OrderedScan.runningSumsLong(
        df, "k", Seq("a" -> "ra", "b" -> "rb"), buckets = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    var (sa, sb) = (0L, 0L)
    (1L to 200L).foreach { k =>
      sa += k % 7; sb += k % 5
      assert(fused(k) === ((sa, sb)), s"at k=$k")
    }
  }

  test("intervalCoverage: overlap and adjacency merge, gaps split, per entity") {
    val base = 1700000000000000L // µs
    def ev(u: Long, offUs: Long, durUs: Long) =
      (u, new Timestamp(base / 1000 + offUs / 1000), durUs)
    // user 1: [0,10] ∪ [5,12] (overlap) ∪ [12,15] (adjacent — still one
    // island: s > prevMax is false at equality) then gap → [20,30]
    // user 2: zero-length interval at 100 (covered 0, one island)
    val ms = 1000L // µs per ms — Timestamp construction is ms-resolution
    val rows = Seq(
      ev(1L, 0L, 10 * ms), ev(1L, 5 * ms, 7 * ms), ev(1L, 12 * ms, 3 * ms),
      ev(1L, 20 * ms, 10 * ms),
      ev(2L, 100 * ms, 0L))
    val df = rows.toDF("user_id", "ts", "dur")
    val got = Events.intervalCoverage(df, "user_id", "ts", col("dur"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((25 * ms, 2L, 15 * ms))) // [0,15] + [20,30]
    assert(got(2L) === ((0L, 1L, 0L)))
  }
}
