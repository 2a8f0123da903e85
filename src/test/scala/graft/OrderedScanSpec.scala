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

  test("backwardFill matches the single-window (desc) reference") {
    val df = seriesDf(input: _*)
    val got = collectKV(OrderedScan.backwardFill(df, "k", Seq("v"), buckets = 8))
    // next multiple of 7 at or after i (last multiple <= 499 is 497)
    val expect = (0 until n).map { i =>
      val nx = (i + 6) / 7 * 7
      (i.toLong, if (nx < n) Some(nx.toDouble) else None)
    }
    assert(got === expect)
  }

  test("shift matches lag over a single global window") {
    val df = seriesDf(input: _*)
    val got = OrderedScan.shift(df, "k", Seq("v"), 3, buckets = 8)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
    val vals = input.map { case (_, v) => Option(v).map(_.doubleValue) }
    val expect = (0 until n).map(i =>
      (i.toLong, if (i < 3) None else vals(i - 3)))
    assert(got.toSeq === expect)
  }

  test("null keys sort FIRST (parity with Window.orderBy asc nulls-first)") {
    val rows = Seq[(java.lang.Long, java.lang.Double)](
      (null, 99.0), (1L, null), (2L, null), (3L, 3.0))
    val df = rows.toDF("k", "v")
    // window form: null key first → its value is the carry-in for key 1,2
    val got = OrderedScan.forwardFill(df, "k", Seq("v"), buckets = 4)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(got === Set(
      (None, Some(99.0)), (Some(1L), Some(99.0)),
      (Some(2L), Some(99.0)), (Some(3L), Some(3.0))))
    val ord = OrderedScan.rowNumber(df, "k", "ord", buckets = 4)
      .where(col("k").isNull).select("ord").head.getLong(0)
    assert(ord === 0L, "null key must be ordinal 0, as in Window.orderBy")
  }

  test("ewma matches the sequential recurrence to 1e-12 relative across many buckets") {
    val xs = (0 until 1000).map(i => (i.toLong, math.sin(i * 0.7) * 1e6 + 2e6))
    val df = seriesDf(xs.map { case (k, v) => (k, Double.box(v)) }: _*)
    val got = OrderedScan.ewma(df, "k", "v", alpha = 0.1, "y", buckets = 16)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    var y = Double.NaN
    val want = xs.map { case (k, x) =>
      y = if (y.isNaN) x else 0.1 * x + 0.9 * y
      (k, y)
    }
    got.zip(want).foreach { case ((gk, gv), (wk, wv)) =>
      assert(gk === wk)
      assert(math.abs(gv - wv) <= 1e-12 * math.abs(wv), s"k=$gk got=$gv want=$wv")
    }
  }

  test("ewmaByGroup: exact per-group recurrence, groups independent across partitions") {
    import spark.implicits._
    val rows = for (g <- 0L until 37L; i <- 0L until 40L) yield (g, i, (g * 31 + i * 7 % 13).toDouble)
    val df = rows.toDF("g", "k", "v")
    val got = OrderedScan.ewmaByGroup(df, "g", "k", "v", alpha = 0.3, "y")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      var y = Double.NaN
      rs.sortBy(_._2).foreach { case (_, k, v) =>
        y = if (y.isNaN) v else 0.3 * v + 0.7 * y
        assert(got((g, k)) === y, s"g=$g k=$k") // bit-exact, no tolerance
      }
    }
  }

  test("ewma drops nulls and seeds from the first non-null value") {
    val df = seriesDf((1L, null), (2L, 10.0), (3L, null), (4L, 20.0))
    val got = OrderedScan.ewma(df, "k", "v", alpha = 0.5, "y", buckets = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.toSeq === Seq((2L, 10.0), (4L, 15.0)))
  }

  test("large unpartitioned KSeries ops auto-route away from the single-task global window") {
    import graft.core.KSeries
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    spark.conf.set("spark.graft.globalWindow.maxBytes", "0") // everything is "large"
    // AQE wraps executedPlan in an AdaptiveSparkPlanExec LEAF that hides
    // every node from collect() — turn it off so the shape assertions see
    // the actual operators (they were vacuously green otherwise)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = seriesDf(input: _*)
      val s = KSeries(df, ordered = true)
      var sawWindowNodes = false
      for ((routed, label) <- Seq(
          (s.fillForward(), "fillForward"), (s.fillBackward(), "fillBackward"),
          (s.shift(2), "shift"), (s.diff(1), "diff"))) {
        val plan = routed.df.queryExecution.executedPlan
        assert(plan.collect { case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a }.isEmpty, "AQE still on — assertions would be vacuous")
        val globalWindows = plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        sawWindowNodes ||= globalWindows.nonEmpty
        // any remaining unpartitioned window must sit over a tiny per-bucket
        // aggregate (the carry table), never over the raw data
        globalWindows.foreach { w =>
          val overSummary = w.child.collect {
            case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
          }.nonEmpty
          assert(overSummary, s"$label: global window over non-aggregated input:\n$w")
        }
      }
      // the carry windows of the stitched form must be visible — otherwise
      // the loop above asserted nothing
      assert(sawWindowNodes, "no WindowExec found in any routed plan — detector is blind")
      // and the routed results agree with the window form
      spark.conf.set("spark.graft.globalWindow.maxBytes", Long.MaxValue.toString)
      val df2 = seriesDf(input: _*)
      val sSmall = KSeries(df2, ordered = true)
      spark.conf.set("spark.graft.globalWindow.maxBytes", "0")
      val sLarge = KSeries(df2, ordered = true)
      def kv(x: KSeries) = collectKV(x.df)
      spark.conf.set("spark.graft.globalWindow.maxBytes", Long.MaxValue.toString)
      val smallFF = kv(sSmall.fillForward()); val smallD = kv(sSmall.diff(1))
      spark.conf.set("spark.graft.globalWindow.maxBytes", "0")
      assert(kv(sLarge.fillForward()) === smallFF)
      assert(kv(sLarge.diff(1)).sortBy(_._1) === smallD.sortBy(_._1))
    } finally {
      spark.conf.unset("spark.graft.globalWindow.maxBytes")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("string-keyed series auto-route through EXACT lexicographic buckets") {
    import graft.core.KSeries
    import org.apache.spark.sql.types._
    // '10' sorts before '9' lexicographically but after it numerically —
    // the stitch must bucket on sampled boundary KEYS compared with the
    // string's own <=, never a numeric proxy, so the routed results are
    // identical to the single-window form at any size.
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    val rows = (1 to 500).map(i => org.apache.spark.sql.Row(
      i.toString, if (i % 3 == 0) null else Double.box(i.toDouble)))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    def kv(d: org.apache.spark.sql.DataFrame): Seq[(String, Option[Double])] =
      d.collect().toSeq
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1)
    def withMax[T](maxBytes: String)(body: => T): T = {
      spark.conf.set("spark.graft.globalWindow.maxBytes", maxBytes)
      try body finally spark.conf.unset("spark.graft.globalWindow.maxBytes")
    }
    val s = KSeries(df, ordered = true)
    val smallShift = withMax(Long.MaxValue.toString)(kv(s.shift(1).df))
    val smallFill = withMax(Long.MaxValue.toString)(kv(s.fillForward().df))
    val largeShift = withMax("0")(kv(s.shift(1).df))
    val largeFill = withMax("0")(kv(s.fillForward().df))
    assert(largeShift === smallShift, "routed string shift must match the window form")
    assert(largeFill === smallFill, "routed string fill must match the window form")
    // and the order really is lexicographic: the predecessor of '2' is '199'
    assert(smallShift.find(_._1 == "2").get._2 === Some(199.0))
    // direct OrderedScan forms work on string keys too
    assert(kv(OrderedScan.forwardFill(df, "k", Seq("v"), buckets = 8)) === smallFill)
    // key-distance windows still refuse strings (no key arithmetic)
    val err = intercept[IllegalArgumentException] {
      OrderedScan.slidingRangeAgg(df, "k", "v", 10L, sum, "v")
    }
    assert(err.getMessage.contains("numeric"))
  }

  test("string buckets: prefix fast path orders high-bit bytes unsigned; " +
    "shared-prefix keys fall back to exact string cuts") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", StringType, nullable = false)))
    def ranks(keys: Seq[String], buckets: Int): Seq[(String, Long)] = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(keys.map(org.apache.spark.sql.Row(_)): _*), schema)
      OrderedScan.rowNumber(df, "k", "__ord", buckets)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq
    }
    // UTF8-BINARY order with multi-byte characters: é = C3 A9, ß = C3 9F,
    // 😀 = F0 9F..., ￮ = EF BF AE — all with high bits set. A SIGNED prefix
    // comparison would order them before ASCII; the sign-flip must keep
    // them after. Expected order = Spark's own orderBy (UTF8 binary).
    val mixed = Seq("zz", "é9", "ß1", "😀", "abc", "￮", "A", "~tilde")
    val expected = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(mixed.map(org.apache.spark.sql.Row(_)): _*), schema)
      df.orderBy(col("k")).collect().map(_.getString(0)).toSeq
    }
    assert(ranks(mixed, buckets = 3).map(_._1) === expected)
    // 600 keys sharing a 12-byte prefix: every cut has the SAME 8-byte
    // prefix, so the fast path must disable itself and the exact string
    // chain must still rank globally ("url_prefix_10" < "url_prefix_9")
    val shared = (1 to 600).map(i => s"url_prefix_$i")
    val got = ranks(shared, buckets = 8)
    assert(got.map(_._1) === shared.sorted)
    assert(got.map(_._2) === (0L until 600L))
    // diverse keys at scale through the fast path: md5-ish hex strings
    val hexed = (1 to 600).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val gotHex = ranks(hexed, buckets = 8)
    assert(gotHex.map(_._1) === hexed.sorted)
    assert(gotHex.map(_._2) === (0L until 600L))
  }

  test("slidingAgg matches the single global window, including spans wider than a bucket") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Boundary
    val df = seriesDf(input: _*)
    // n=120 exceeds the ~62-row buckets: warm-up rows must forward through
    // SEVERAL successor buckets for the frames to stay exact
    for (n <- Seq(3, 120); boundary <- Seq(Boundary.Skip, Boundary.AtBeginning)) {
      val got = collectKV(
        OrderedScan.slidingAgg(df, "k", "v", n, boundary, avg, "v", buckets = 8))
      val w = Window.orderBy(col("k")).rowsBetween(-(n - 1), 0)
      val all = df.select(col("k"), avg(col("v")).over(w).as("v"),
        count(lit(1)).over(w).as("__c"))
      val expDf = if (boundary == Boundary.Skip) all.where(col("__c") === n) else all
      val exp = collectKV(expDf.select("k", "v"))
      assert(got === exp, s"n=$n boundary=$boundary")
    }
  }

  test("slidingAgg descending matches the forward-anchored global window") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Boundary
    val df = seriesDf(input: _*)
    for (n <- Seq(5, 120)) {
      val got = collectKV(OrderedScan.slidingAgg(
        df, "k", "v", n, Boundary.Skip, sum, "v", buckets = 8, descending = true))
      val w = Window.orderBy(col("k")).rowsBetween(0, n - 1)
      val exp = collectKV(
        df.select(col("k"), sum(col("v")).over(w).as("v"), count(lit(1)).over(w).as("__c"))
          .where(col("__c") === n).select("k", "v"))
      assert(got === exp, s"n=$n")
    }
  }

  test("slidingAgg frames keep ASCENDING key order in both directions (order-sensitive aggs)") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Boundary
    // collect_list + first are order-sensitive: the stitched frames must
    // present rows ascending-by-key exactly like the single-window form
    val df = seriesDf((0 until 300).map(i => (i.toLong, Double.box(i * 2.0))): _*)
    def lists(d: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Double])] =
      d.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    for (n <- Seq(4, 90)) {
      val gotB = lists(OrderedScan.slidingAgg(
        df, "k", "v", n, Boundary.Skip, collect_list, "v", buckets = 8))
      val wB = Window.orderBy(col("k")).rowsBetween(-(n - 1), 0)
      val expB = lists(df
        .select(col("k"), collect_list(col("v")).over(wB).as("v"),
          count(lit(1)).over(wB).as("__c"))
        .where(col("__c") === n).select("k", "v"))
      assert(gotB === expB, s"backward n=$n")
      val gotF = lists(OrderedScan.slidingAgg(
        df, "k", "v", n, Boundary.Skip, collect_list, "v", buckets = 8, descending = true))
      val wF = Window.orderBy(col("k")).rowsBetween(0, n - 1)
      val expF = lists(df
        .select(col("k"), collect_list(col("v")).over(wF).as("v"),
          count(lit(1)).over(wF).as("__c"))
        .where(col("__c") === n).select("k", "v"))
      assert(gotF === expF, s"forward n=$n")
    }
  }

  test("slidingRangeAgg matches the single global RANGE window across buckets") {
    import org.apache.spark.sql.expressions.Window
    val df = seriesDf(input: _*)
    for (dist <- Seq(10L, 100L)) { // 100 > the ~62-key bucket width
      val got = collectKV(
        OrderedScan.slidingRangeAgg(df, "k", "v", dist, sum, "v", buckets = 8))
      val w = Window.orderBy(col("k").cast("long")).rangeBetween(-(dist - 1), 0)
      val exp = collectKV(df.select(col("k"), sum(col("v")).over(w).as("v")))
      assert(got === exp, s"dist=$dist")
    }
  }

  test("slidingRangeAgg matches the global RANGE window on FRACTIONAL keys (long-cast peers)") {
    import org.apache.spark.sql.expressions.Window
    // Doubles like 100.4 / 100.6 are RANGE peers after the long cast but
    // distinct raw keys: if buckets were cut on the raw key, peers could
    // straddle a boundary and the strict warm-up predicate would skip them.
    // Dense fractional steps guarantee many such peers land next to every
    // bucket cut (8 buckets over 2000 rows).
    val rows = (0 until 2000).map { i =>
      org.apache.spark.sql.Row(i * 0.2 + (if (i % 3 == 0) 0.05 else 0.0), i * 1.0)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val df = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    def kv(d: org.apache.spark.sql.DataFrame): Seq[(Double, Option[Double])] =
      d.collect().toSeq
        .map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .sortBy(_._1)
    for (dist <- Seq(3L, 50L)) {
      val got = kv(OrderedScan.slidingRangeAgg(df, "k", "v", dist, sum, "v", buckets = 8))
      val w = Window.orderBy(col("k").cast("long")).rangeBetween(-(dist - 1), 0)
      val exp = kv(df.select(col("k"), sum(col("v")).over(w).as("v")))
      assert(got === exp, s"dist=$dist")
    }
  }

  test("chunkAgg matches chunkInto's single-window form on every boundary") {
    import graft.core.KSeries
    import graft.operators.{Boundary, Windowing}
    val df = seriesDf(input: _*)
    val s = KSeries(df, ordered = true)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2))).toSeq.sortBy(_._1)
    for (boundary <- Seq(Boundary.Skip, Boundary.AtBeginning); n <- Seq(7, 120)) {
      val got = rows(OrderedScan.chunkAgg(df, "k", "v", n, boundary,
        Seq((sum(_), "s"), (count(_), "n")), buckets = 8))
      val exp = rows(Windowing.chunkInto(s, n, boundary)((sum(_), "s"), (count(_), "n")))
      assert(got === exp, s"n=$n boundary=$boundary")
    }
  }

  test("large unpartitioned sliding-window family auto-routes: no global WindowExec over data") {
    import graft.core.KSeries
    import graft.operators.{Boundary, Windowing}
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = seriesDf(input: _*)
      val s = KSeries(df, ordered = true)
      // small-path references
      spark.conf.set("spark.graft.globalWindow.maxBytes", Long.MaxValue.toString)
      val smallW = collectKV(Windowing.windowInto(s, 7, Boundary.AtBeginning)(avg))
      val smallF = collectKV(Windowing.windowIntoForward(s, 7, Boundary.Skip)(avg))
      val smallD = collectKV(Windowing.windowDistInto(s, 10)(sum))
      def pv(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq.sortBy(_._1)
      val smallP = pv(s.pairwise())
      // large: every form must route; sliding/range/chunk plans contain NO
      // unpartitioned WindowExec at all
      spark.conf.set("spark.graft.globalWindow.maxBytes", "0")
      val routedW = Windowing.windowInto(s, 7, Boundary.AtBeginning)(avg)
      val routedF = Windowing.windowIntoForward(s, 7, Boundary.Skip)(avg)
      val routedD = Windowing.windowDistInto(s, 10)(sum)
      for ((d, label) <- Seq((routedW, "windowInto"), (routedF, "windowIntoForward"),
          (routedD, "windowDistInto"))) {
        val bad = d.queryExecution.executedPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        assert(bad.isEmpty, s"$label: unpartitioned WindowExec survived the route")
      }
      assert(collectKV(routedW) === smallW)
      assert(collectKV(routedF) === smallF)
      assert(collectKV(routedD) === smallD)
      // pairwise routes through the positional shift: its only unpartitioned
      // window is the tiny per-bucket carry (over an aggregate), never data
      val routedP = s.pairwise()
      routedP.queryExecution.executedPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.foreach { w =>
        val overSummary = w.child.collect {
          case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
        }.nonEmpty
        assert(overSummary, s"pairwise: global window over non-aggregated input:\n$w")
      }
      assert(pv(routedP) === smallP)
    } finally {
      spark.conf.unset("spark.graft.globalWindow.maxBytes")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("ewma: a NaN data value poisons the recurrence forward, like the sequential loop") {
    val xs = (0 until 300).map { i =>
      (i.toLong, if (i == 100) Double.NaN else math.cos(i * 0.3) + 2.0)
    }
    val df = seriesDf(xs.map { case (k, v) => (k, Double.box(v)) }: _*)
    val got = OrderedScan.ewma(df, "k", "v", alpha = 0.2, "y", buckets = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.length === 300)
    var y = Double.NaN; var seeded = false
    xs.zip(got).foreach { case ((k, x), (gk, gv)) =>
      y = if (!seeded) x else 0.2 * x + 0.8 * y
      seeded = true
      assert(gk === k)
      if (k >= 100) assert(gv.isNaN, s"k=$k must stay NaN once poisoned, got $gv")
      else assert(math.abs(gv - y) <= 1e-12 * math.abs(y), s"k=$k got=$gv want=$y")
    }
  }

  test("runningMinMax matches a sequential expanding-extrema scan; nulls transparent") {
    val df = seriesDf(input: _*) // v present only at k % 7 == 0
    val got = OrderedScan.runningMinMax(df, "k", "v", "mn", "mx", buckets = 8)
      .collect().map(r => (r.getLong(0),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
         if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .sortBy(_._1)
    var mn = Option.empty[Double]
    var mx = Option.empty[Double]
    (0 until n).foreach { i =>
      if (i % 7 == 0) {
        mn = Some(math.min(mn.getOrElse(Double.MaxValue), i.toDouble))
        mx = Some(math.max(mx.getOrElse(Double.MinValue), i.toDouble))
      }
      assert(got(i) === ((i.toLong, (mn, mx))), s"at k=$i")
    }
  }

  test("runningStats: the 4-way fused pass equals its component stitches") {
    val df = (0 until 300).map(i => ((i * 37 % 1000).toLong, (i % 9 - 4).toDouble))
      .toDF("k", "v").distinct()
    val fused = OrderedScan.runningStats(df, "k", "rn", "v", "cum", "mn", "mx", buckets = 8)
      .collect().map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("rn"), r.getAs[Double]("cum"),
         r.getAs[Double]("mn"), r.getAs[Double]("mx")))).toMap
    val rns = OrderedScan.rowNumberAndSum(df, "k", "rn", "v", "cum", buckets = 8)
      .collect().map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("rn"), r.getAs[Double]("cum")))).toMap
    val mm = OrderedScan.runningMinMax(df, "k", "v", "mn", "mx", buckets = 8)
      .collect().map(r => (r.getAs[Long]("k"),
        (r.getAs[Double]("mn"), r.getAs[Double]("mx")))).toMap
    fused.foreach { case (k, (rn, cum, mn, mx)) =>
      assert((rn, cum) === rns(k), s"rank/sum at k=$k")
      assert((mn, mx) === mm(k), s"extrema at k=$k")
    }
  }

  test("rowNumberAndSum: one fused pass equals rowNumber + runningSum") {
    val df = (0 until 300).map(i => ((i * 37 % 1000).toLong, (i % 5 + 1).toLong))
      .toDF("k", "w").distinct() // distinct keys for a deterministic order
    val fused = OrderedScan.rowNumberAndSum(df, "k", "rn", "w", "cum", buckets = 8)
      .collect().map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("rn"), r.getAs[Double]("cum")))).toMap
    val rn = OrderedScan.rowNumber(df, "k", "rn", buckets = 8)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("rn"))).toMap
    val cum = OrderedScan.runningSum(df, "k", "w", "cum", buckets = 8)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("cum"))).toMap
    assert(fused.view.mapValues(_._1).toMap === rn)
    assert(fused.view.mapValues(_._2).toMap === cum)
    // and the fused pass is internally consistent: cum at rank r = prefix sum
    val ordered = fused.toSeq.sortBy(_._2._1)
    assert(ordered.map(_._1) === ordered.map(_._1).sorted)
  }
}
