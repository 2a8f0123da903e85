package graft

import org.apache.spark.sql.functions._

import graft.core.Lookup
import graft.operators.AsOf

/** As-of join semantics, incl. the fill-then-as-of missing-value trap
  * (SURVEY §7.4.1; reference src/JoinHelpers.fs:49-53,
  * test tests/FSharp.DataFrame.Tests/Series.fs:287-345). */
class AsOfSpec extends SparkSpecBase {

  private val data = // right side: value at 3 is MISSING
    Seq((1L, Some(10.0)), (3L, None), (5L, Some(50.0)))
  private def rightDf = seriesDf(data.map { case (k, v) =>
    (k, v.map(Double.box).orNull) }: _*)

  private def probes(ks: Long*) = {
    val df = seriesDf(ks.map(k => (k, null: java.lang.Double)): _*)
    df.select(col("k").as("g"))
  }

  test("NearestSmaller: inclusive, fill-then-as-of through missing") {
    val r = AsOf.join(probes(2L, 3L, 4L, 5L, 6L), "g", rightDf, "k", Seq("v"),
      Lookup.NearestSmaller)
    // probe 3: nearest key 3 holds MISSING → carries value from key 1
    //   (the reference forward-fills the right vector BEFORE reindexing)
    assert(collectKV(r, "g", "v") === Seq(
      (2L, Some(10.0)), (3L, Some(10.0)), (4L, Some(10.0)),
      (5L, Some(50.0)), (6L, Some(50.0))))
  }

  test("NearestSmaller: probe before all data keys → missing") {
    val r = AsOf.join(probes(0L), "g", rightDf, "k", Seq("v"), Lookup.NearestSmaller)
    assert(collectKV(r, "g", "v") === Seq((0L, None)))
  }

  test("NearestGreater: inclusive, backward fill through missing") {
    val r = AsOf.join(probes(0L, 2L, 3L, 5L, 6L), "g", rightDf, "k", Seq("v"),
      Lookup.NearestGreater)
    // probe 3: key 3 missing → backward-fill gives value at 5
    assert(collectKV(r, "g", "v") === Seq(
      (0L, Some(10.0)), (2L, Some(50.0)), (3L, Some(50.0)),
      (5L, Some(50.0)), (6L, None)))
  }

  test("strict NearestSmaller excludes the exact key") {
    val r = AsOf.join(probes(5L), "g", rightDf, "k", Seq("v"),
      Lookup.NearestSmaller, strict = true)
    // strictly < 5 → keys {1,3}, 3 missing → 10.0
    assert(collectKV(r, "g", "v") === Seq((5L, Some(10.0))))
  }

  test("partitioned as-of runs independently per group") {
    import spark.implicits._
    val right = Seq(("a", 1L, 10.0), ("a", 4L, 40.0), ("b", 2L, 200.0))
      .toDF("sym", "k", "v")
    val left = Seq(("a", 3L), ("b", 3L), ("b", 1L)).toDF("sym", "g")
    val r = AsOf.join(left, "g", right, "k", Seq("v"),
      Lookup.NearestSmaller, partitionBy = Seq("sym"))
    val got = r.select("sym", "g", "v").collect()
      .map(x => (x.getString(0), x.getLong(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
    assert(got === Set(("a", 3L, Some(10.0)), ("b", 3L, Some(200.0)), ("b", 1L, None)))
  }

  test("left columns are all preserved") {
    import spark.implicits._
    val left = Seq((2L, "x"), (5L, "y")).toDF("g", "tag")
    val r = AsOf.join(left, "g", rightDf, "k", Seq("v"), Lookup.NearestSmaller)
    assert(r.columns.toSeq === Seq("g", "tag", "v"))
    assert(r.count() === 2)
  }

  test("broadcastJoin fails fast when the data side exceeds maxRows") {
    spark.conf.set("spark.graft.broadcastAsOf.maxRows", "2")
    try {
      // 3 data rows > limit 2 → must throw BEFORE collecting, and the
      // message must point at the shuffle form (AsOf.join)
      val ex = intercept[IllegalArgumentException] {
        AsOf.broadcastJoin(probes(2L, 4L), "g", rightDf, "k", "v",
          Lookup.NearestSmaller)
      }
      assert(ex.getMessage.contains("AsOf.join"))
      assert(ex.getMessage.contains("spark.graft.broadcastAsOf.maxRows"))
      // at the limit it still works and matches the shuffle form
      spark.conf.set("spark.graft.broadcastAsOf.maxRows", "3")
      val r = AsOf.broadcastJoin(probes(2L, 4L), "g", rightDf, "k", "v",
        Lookup.NearestSmaller)
      assert(collectKV(r, "g", "v") === Seq((2L, Some(10.0)), (4L, Some(10.0))))
    } finally spark.conf.unset("spark.graft.broadcastAsOf.maxRows")
  }

  test("broadcastJoinMulti carries typed columns and matches the shuffle form") {
    import spark.implicits._
    // per-column independent fill: price missing at k=3, tag missing at k=5
    val right = Seq(
      (1L, Some(10.0), Some("a"), Some(100L)),
      (3L, None, Some("b"), None),
      (5L, Some(50.0), None, Some(500L)))
      .toDF("k", "price", "tag", "qty")
      .select(col("k"), col("price"), col("tag"), col("qty"))
    val probes = Seq(2L, 3L, 4L, 6L).toDF("g")
    val got = AsOf.broadcastJoinMulti(probes, "g", right, "k",
      Seq("price", "tag", "qty"), Lookup.NearestSmaller)
    // types preserved — no double cast
    assert(got.schema("tag").dataType === org.apache.spark.sql.types.StringType)
    assert(got.schema("qty").dataType === org.apache.spark.sql.types.LongType)
    val want = AsOf.join(probes, "g", right, "k", Seq("price", "tag", "qty"),
      Lookup.NearestSmaller)
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))
    }.toSet
    assert(key(got) === key(want))
    // fill-through-missing: probe 4 gets price from k=1 (k=3 holds null),
    // tag from k=3
    assert(key(got).contains((4L, Some(10.0), Some("b"), Some(100L))))
    // unsupported value type names the shuffle alternative
    val arr = Seq((1L, Seq(1.0))).toDF("k", "vs")
    val e = intercept[IllegalArgumentException] {
      AsOf.broadcastJoinMulti(probes, "g", arr, "k", Seq("vs"), Lookup.NearestSmaller)
    }
    assert(e.getMessage.contains("AsOf.join"))
  }

  test("broadcastJoinMulti: date/timestamp payloads under BOTH datetime external APIs, decimal exact") {
    import spark.implicits._
    val right = Seq(
      (1L, "2024-01-01", "2024-01-01 00:00:01", "1.25"),
      (3L, "2024-03-01", "2024-03-01 00:00:03", "3.75"))
      .toDF("k", "d0", "t0", "m0")
      .select(col("k"), col("d0").cast("date").as("d"),
        col("t0").cast("timestamp").as("ts"),
        col("m0").cast("decimal(10,2)").as("m"))
    val probes = Seq(2L, 4L).toDF("g")
    def run() = AsOf.broadcastJoinMulti(probes, "g", right, "k",
      Seq("d", "ts", "m"), Lookup.NearestSmaller)
      .collect().map(r => (r.getLong(0), String.valueOf(r.get(1)),
        String.valueOf(r.get(2)).replace('T', ' ').take(19),
        r.getDecimal(3).toPlainString)).toSet
    val want = Set(
      (2L, "2024-01-01", "2024-01-01 00:00:01", "1.25"),
      (4L, "2024-03-01", "2024-03-01 00:00:03", "3.75"))
    val key = "spark.sql.datetime.java8API.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false") // legacy java.sql.Date/Timestamp externals
      assert(run() === want)
      spark.conf.set(key, "true") // java8 LocalDate/Instant externals
      assert(run() === want)
      // decimal keeps the source's exact precision/scale — no (38,18) drift
      val got = AsOf.broadcastJoinMulti(probes, "g", right, "k", Seq("m"),
        Lookup.NearestSmaller)
      assert(got.schema("m").dataType ===
        org.apache.spark.sql.types.DecimalType(10, 2))
    } finally spark.conf.set(key, prev)
  }

  test("broadcastJoinMulti rejects decimals outside the lossless (38,18) envelope") {
    import spark.implicits._
    val probes = Seq(2L).toDF("g")
    // scale > 18: round-tripping through Decimal(38,18) would HALF_UP-round
    def rightAs(t: String) = Seq((1L, "1.25")).toDF("k", "m0")
      .select(col("k"), col("m0").cast(t).as("m"))
    val e1 = intercept[IllegalArgumentException] {
      AsOf.broadcastJoinMulti(probes, "g", rightAs("decimal(38,20)"), "k",
        Seq("m"), Lookup.NearestSmaller)
    }
    assert(e1.getMessage.contains("AsOf.join") && e1.getMessage.contains("38,20"))
    // precision − scale > 20: > 20 integral digits overflow to null
    val e2 = intercept[IllegalArgumentException] {
      AsOf.broadcastJoinMulti(probes, "g", rightAs("decimal(25,2)"), "k",
        Seq("m"), Lookup.NearestSmaller)
    }
    assert(e2.getMessage.contains("AsOf.join") && e2.getMessage.contains("25,2"))
    // the envelope's inside edge still works: scale 18, 20 integral digits
    val ok = AsOf.broadcastJoinMulti(probes, "g", rightAs("decimal(38,18)"), "k",
      Seq("m"), Lookup.NearestSmaller)
    assert(ok.collect().head.getDecimal(1).toPlainString
      === "1.250000000000000000")
  }

  test("broadcastJoin rejects a non-numeric maxRows conf") {
    spark.conf.set("spark.graft.broadcastAsOf.maxRows", "lots")
    try {
      val ex = intercept[IllegalArgumentException] {
        AsOf.broadcastJoin(probes(2L), "g", rightDf, "k", "v",
          Lookup.NearestSmaller)
      }
      assert(ex.getMessage.contains("must be a long"))
    } finally spark.conf.unset("spark.graft.broadcastAsOf.maxRows")
  }
}
