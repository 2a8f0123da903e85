package graft

import org.apache.spark.sql.functions._

import graft.core.{KFrame, KSeries, Lookup}
import graft.functions.CustomAggs
import graft.operators.{ChunkWhile, Dedup, Resample}

/** Second-pass operators: windowWhile, backward resample, transpose,
  * custom Aggregators, embedding near-dup. */
class ExtendedOpsSpec extends SparkSpecBase {

  import spark.implicits._

  private def s(rows: (Long, java.lang.Double)*): KSeries =
    KSeries(seriesDf(rows: _*), ordered = true)

  test("windowWhile: overlapping windows while pred(first, cur)") {
    val df = seriesDf((1L, 1.0), (2L, 2.0), (5L, 5.0), (6L, 6.0))
    val r = ChunkWhile.windowAssign(df, "k", (f, c) => c - f < 3)
      .groupBy(col("window_key")).agg(sum(col("v")).as("total"))
    val got = r.collect().map(x => (x.getLong(0), x.getDouble(1))).toMap
    // windows: 1→{1,2}, 2→{2}, 5→{5,6}, 6→{6}  (3 breaks both gaps)
    assert(got === Map(1L -> 3.0, 2L -> 2.0, 5L -> 11.0, 6L -> 6.0))
  }

  test("windowWhile restarts per partition group") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 2L, 20.0))
      .toDF("g", "k", "v")
    val r = ChunkWhile.windowAssign(df, "k", (f, c) => c - f < 5, partitionBy = Seq("g"))
    val got = r.select("g", "k", "window_key").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    // group a: window 1 contains {1,2}, window 2 contains {2}; group b alone
    assert(got === Set(("a", 1L, 1L), ("a", 2L, 1L), ("a", 2L, 2L), ("b", 2L, 2L)))
  }

  test("resample Backward: key = min boundary >= k, after-last absorbed into last") {
    val in = s((1L, 1.0), (12L, 12.0), (26L, 26.0), (30L, 30.0))
    val bounds = Seq(10L, 20L, 25L).toDF("b")
    val r = Resample.resample(in, bounds, "b", Lookup.NearestGreater)(
      (sum(_), "total"), (count(_), "n"))
    val got = r.select("k", "total", "n").collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) None else Some(x.getDouble(1)),
        if (x.isNullAt(2)) 0L else x.getLong(2))).toSet
    // 1→10; 12→20; 26,30 after last boundary → absorbed into 25
    assert(got === Set(
      (10L, Some(1.0), 1L), (20L, Some(12.0), 1L), (25L, Some(56.0), 2L)))
  }

  test("custom Aggregators: weightedMean and geoMean, null-skipping") {
    val df = Seq(
      (Some(10.0), Some(1.0)), (Some(20.0), Some(3.0)), (None, Some(9.0)))
      .toDF("x", "w")
    val r = df.agg(
      CustomAggs.weightedMean(col("x"), col("w")).as("wm"),
      CustomAggs.geoMean(col("x")).as("gm")).head
    assert(math.abs(r.getDouble(0) - 17.5) < 1e-12) // (10+60)/4
    assert(math.abs(r.getDouble(1) - math.sqrt(200.0)) < 1e-9)
  }

  test("embedding near-dup exact vs LSH: LSH is a subset with decent recall") {
    val vecs = (0 until 60).map { i =>
      // three tight clusters of 20 around orthogonal-ish axes + noise
      val base = Array.fill(16)(0.0f)
      base(i % 3) = 1.0f
      val jig = base.zipWithIndex.map { case (x, j) =>
        x + 0.05f * (((i * 31 + j * 17) % 7) - 3)
      }
      (i.toLong, jig.toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(vecs, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= exact.size / 2, s"recall too low: ${lsh.size}/${exact.size}")
  }

  test("embeddingNearDup guard: trips above spark.graft.exactNearDup.maxRows with a pointer to the LSH path") {
    val vecs = (0 until 8).map(i => (i.toLong, Seq.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    spark.conf.set("spark.graft.exactNearDup.maxRows", "5")
    try {
      val e = intercept[IllegalArgumentException] {
        Dedup.embeddingNearDup(vecs, "vec_id", "embedding", 0.9)
      }
      assert(e.getMessage.contains("embeddingNearDupLsh"))
      // under the limit the operator still works
      spark.conf.set("spark.graft.exactNearDup.maxRows", "100")
      Dedup.embeddingNearDup(vecs, "vec_id", "embedding", 0.99).collect()
    } finally spark.conf.unset("spark.graft.exactNearDup.maxRows")
  }

  test("firstLast/keyRange/firstValue/lastValue (reference SeriesModule.fs:199-202)") {
    val ser = s((3L, 30.0), (1L, 10.0), (2L, null), (5L, 50.0))
    val fl = ser.firstLast.collect()(0)
    assert((fl.getLong(0), fl.getLong(1)) === ((1L, 5L)))
    assert((fl.getDouble(2), fl.getDouble(3)) === ((10.0, 50.0)))
    val kr = ser.keyRange.collect()(0)
    assert((kr.getLong(0), kr.getLong(1)) === ((1L, 5L))) // missing row at 2 still in range
    assert(ser.firstValue === 10.0)
    assert(ser.lastValue === 50.0)
    // endpoint with a MISSING value: firstLast skips to the first present one
    val lead = s((0L, null), (1L, 10.0))
    assert(lead.firstLast.collect()(0).getLong(0) === 1L)
  }

  test("KFrame.fromSeries: key union, missing where absent, one pivot shuffle for same-typed series (reference Frame.fs:745-813)") {
    val a = s((1L, 10.0), (2L, 20.0))
    val b = s((2L, 200.0), (3L, 300.0))
    val f = KFrame.fromSeries(Seq(("a", a), ("b", b)))
    val rows = f.df.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
    assert(rows === Array(
      (1L, Some(10.0), None), (2L, Some(20.0), Some(200.0)), (3L, None, Some(300.0))))
    // heterogeneous value types take the type-preserving join fold
    val c = KSeries(Seq((1L, "x"), (4L, "y")).toDF("k", "v"), ordered = true)
    val g = KFrame.fromSeries(Seq(("a", a), ("c", c)))
    assert(g.df.schema("a").dataType.typeName === "double")
    assert(g.df.schema("c").dataType.typeName === "string")
    assert(g.df.count() === 3) // keys 1, 2, 4
    val ex = intercept[IllegalArgumentException](
      KFrame.fromSeries(Seq(("a", a), ("a", b))))
    assert(ex.getMessage.contains("unique"))
  }

  test("orderCols sorts the column axis, key columns stay leftmost (reference FrameModule.fs:314-331)") {
    val df = Seq((1L, 2.0, 1.0, 3.0)).toDF("id", "b", "a", "c")
    val kf = KFrame(df, Seq("id"))
    assert(kf.orderCols.df.columns.toSeq === Seq("id", "a", "b", "c"))
  }

  test("reference MultiKey.fs test parity: LookupNOf3 templates match with holes, reject other values") {
    // reference tests/FSharp.DataFrame.Tests/MultiKey.fs:21-37 on key ('a',"hi",1)
    val kf = KFrame(Seq(("a", "hi", 1, 42.0)).toDF("k1", "k2", "k3", "v"),
      Seq("k1", "k2", "k3"))
    assert(kf.lookupLevels(Some("a"), None, None).df.count() === 1)   // Lookup1Of3 'a'
    assert(kf.lookupLevels(None, Some("hi"), None).df.count() === 1)  // Lookup2Of3 "hi"
    assert(kf.lookupLevels(None, None, Some(1)).df.count() === 1)     // Lookup3Of3 1
    assert(kf.lookupLevels(Some("!"), None, None).df.count() === 0)
    assert(kf.lookupLevels(None, Some("hi!"), None).df.count() === 0)
    assert(kf.lookupLevels(None, None, Some(999)).df.count() === 0)
  }

  test("4-level hierarchical key: SimpleLookup wildcard patterns + getRowLevel (reference MultiKey.fs:92-175)") {
    val df = Seq(
      (2024, 1, "a", "x", 1.0), (2024, 2, "a", "y", 2.0),
      (2025, 1, "b", "x", 3.0), (2025, 2, "b", "y", 4.0)).toDF("y", "m", "g", "s", "v")
    // stacked groupRowsBy → 4-level key (y, m, g, s), like nested tuples
    val kf = KFrame(df, Seq("s"), ordered = false)
      .groupRowsBy("g").groupRowsBy("m").groupRowsBy("y")
    assert(kf.keyCols === Seq("y", "m", "g", "s"))
    // Lookup2Of4: pin level 2, wildcard the rest
    val sliced = kf.lookupLevels(None, Some(1), None, None)
    assert(sliced.df.select("v").collect().map(_.getDouble(0)).toSet === Set(1.0, 3.0))
    // LookupAnyOf4 with two pinned levels
    val multi = kf.lookupLevels(Some(2025), None, None, Some("y"))
    assert(multi.df.select("v").collect().map(_.getDouble(0)).toSet === Set(4.0))
    // getRowLevel projects a key level (0-based)
    assert(sliced.df.select(sliced.getRowLevel(2)).collect().map(_.getString(0)).toSet === Set("a", "b"))
    // arity mismatch is an error, like SimpleLookup.Matches
    intercept[IllegalArgumentException](kf.lookupLevels(None, Some(1)))
    intercept[IllegalArgumentException](kf.getRowLevel(4))
  }

  test("simhash block-combo keys: exact recall vs brute-force Hamming, fewer candidates than 16-bit chunks") {
    import graft.functions.{Text, Vectors}
    // near-dup clusters: base docs + variants differing in a few tokens
    val docs = (0L until 120L).map { i =>
      val base = (0 until 30).map(w => s"w${(i % 10) * 100 + w}").mkString(" ")
      val tweak = if (i >= 100) s" extra${i}" else ""
      (i, base + tweak)
    }.toDF("doc_id", "text")
    val got = Dedup.simhash(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle: brute-force all-pairs Hamming over the same fingerprints
    val fp = docs.select(col("doc_id").as("id"),
      Vectors.simhash(Text.tokens(col("text"))).as("fp"))
    val l = fp.select(col("id").as("id_a"), col("fp").as("fp_a"))
    val r = fp.select(col("id").as("id_b"), col("fp").as("fp_b"))
    val brute = l.crossJoin(r).where(col("id_a") < col("id_b"))
      .where(Vectors.hamming64(col("fp_a"), col("fp_b")) <= 3)
      .select("id_a", "id_b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(got === brute, "pigeonhole blocking must have recall 1.0 for Hamming<=3")
    // scale rationale: candidate volume under 33-bit combo keys vs 16-bit
    // chunks — the combo scheme must not produce MORE candidates
    def candidates(keyed: org.apache.spark.sql.DataFrame): Long =
      keyed.select(col("k"), col("id").as("id_a"))
        .join(keyed.select(col("k"), col("id").as("id_b")), Seq("k"))
        .where(col("id_a") < col("id_b")).select("id_a", "id_b").distinct().count()
    val combo = fp.select(col("id"),
      explode(Vectors.simhashBlockKeys(6, 3)(col("fp"))).as("k"))
    val chunk16 = fp.select(col("id"),
      explode(Vectors.simhashBlockKeys(4, 1)(col("fp"))).as("k"))
    assert(candidates(combo) <= candidates(chunk16))
  }

  test("simhashBlockKeys overflow guard uses the real combo-id width") {
    import graft.functions.Vectors
    // default production config (maxHamming=8 → C(11,3)=165 combos, 8 id
    // bits) must pass…
    Vectors.simhashBlockKeys(11, 3)
    // …while a packing whose id bits + value bits exceed 63 must be refused
    // up front (it would collide key spaces through the sign bit), not
    // accepted because "6 bits of id" happened to fit
    val ex = intercept[IllegalArgumentException](Vectors.simhashBlockKeys(8, 8))
    assert(ex.getMessage.contains("overflows"))
    // sanity on the widest accepted default-family config: distinct combos
    // of one fingerprint never collide with each other (id bits partition
    // the key space)
    val keys = Vectors.simhashBlockKeys(11, 3)
    val fpDf = Seq(0x0123456789ABCDEFL, -1L, 0L).toDF("fp")
    val n = fpDf.select(explode(keys(col("fp"))).as("k")).distinct().count()
    // 3 fps × 165 combos: within one fp all 165 keys are distinct (combo id
    // in the high bits); 0L and -1L share no keys with each other
    assert(n >= 165L * 2)
  }

  test("embeddingNearDupLsh builds its plan without any driver-side job (no data collect)") {
    // Round-1 verdict: the scale path must not materialize the corpus on the
    // driver. Plan CONSTRUCTION must therefore launch zero Spark jobs — the
    // candidate verify is expressed as id-joins back to the vectors DF.
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(8)(d => ((i % 5) * 8 + d).toFloat / 40f))
    }.toDF("vec_id", "embedding")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val df = Dedup.embeddingNearDupLsh(vecs, "vec_id", "embedding", 0.9)
    df.queryExecution.executedPlan // force planning too
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after === before,
      s"plan construction ran ${after - before} Spark job(s) — driver-side materialization")
    assert(df.collect().nonEmpty)
  }

  test("assertUniqueKeys raises on duplicate row keys, passes on unique (reference LinearIndex.fs:53-56)") {
    val ok = KFrame(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), Seq("id"))
    assert(ok.assertUniqueKeys.df.count() === 2)
    val dup = KFrame(Seq((1L, "a"), (1L, "b")).toDF("id", "x"), Seq("id"))
    val ex = intercept[Exception](dup.assertUniqueKeys.df.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("duplicate row key")))
  }

  test("approx_percentile stays within its accuracy bound of the exact percentile") {
    // the 100 TB quantile path: approx_percentile is mergeable/one-pass,
    // exact percentile is the small-data oracle
    val df = (1 to 50000).map(i => ((i * 7919) % 50000).toDouble).toDF("x")
    val r = df.agg(
      expr("percentile(x, array(0.5, 0.95))").as("exact"),
      expr("approx_percentile(x, array(0.5, 0.95), 1000)").as("approx")).head
    val exact = r.getSeq[Double](0)
    val approx = r.getSeq[Double](1)
    exact.zip(approx).foreach { case (e, a) =>
      // accuracy 1000 → rank error ≤ n/1000 = 50 ranks ≈ 50 in value space
      assert(math.abs(e - a) <= 100.0, s"exact=$e approx=$a")
    }
  }

  test("approx_count_distinct (HLL) lands within 5% of exact at corpus scale") {
    val df = (1 to 20000).map(i => (i.toLong, s"doc_${i % 7321}")).toDF("id", "fp")
    val r = df.agg(
      countDistinct(col("fp")).as("exact"),
      approx_count_distinct(col("fp"), 0.01).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    // rsd=0.01 → assert within 3 sigma
    assert(math.abs(approx - exact).toDouble / exact < 0.03, s"exact=$exact approx=$approx")
  }

  test("transpose swaps axes on a small aggregated frame") {
    val df = Seq(("A", 1.0, 10.0), ("B", 2.0, 20.0)).toDF("key", "x", "y")
    val r = KFrame(df, Seq("key")).transpose(Seq("A", "B")).df
      .orderBy("column").collect()
    assert(r.map(_.getString(0)).toSeq === Seq("x", "y"))
    assert(r.map(_.getDouble(1)).toSeq === Seq(1.0, 10.0))
    assert(r.map(_.getDouble(2)).toSeq === Seq(2.0, 20.0))
  }
}
