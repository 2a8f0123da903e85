package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordered scans — the 100 TB path for operations that a
  * plain `Window.orderBy(key)` (no partitioning) would collapse into ONE
  * task: forward fill, running totals, global row numbering.
  *
  * Pattern (the classic two-level scan / "stitch" decomposition):
  *   1. bucket rows by key range — boundaries from `approxQuantile` (a tiny
  *      driver-side action over a sampled sketch, like the reference's lazily
  *      materialized sorted key array, reference src/Indices/LinearIndex.fs:45-48);
  *   2. run the scan WITHIN each bucket in parallel
  *      (`Window.partitionBy(bucket).orderBy(key)`);
  *   3. reduce one summary row per bucket (count / last value / total),
  *      prefix-scan that tiny table, and broadcast-join the carry-in back.
  *
  * Each op costs one shuffle on the bucket id + one broadcast — instead of
  * serializing the whole dataset through a single window task.
  */
object OrderedScan {

  /** Key dtypes with an order-exact range-bucket path. Numeric/date/
    * timestamp keys bucket on approx-quantile boundaries of a monotone
    * numeric proxy; StringType buckets on SAMPLED boundary keys compared
    * with the key's own `<=` (exact lexicographic order — `cast("double")`
    * would order '9' before '10' and null out non-numeric strings, which
    * is why strings take the sampling path instead of the proxy).
    * Callers auto-routing to OrderedScan gate on this. */
  def supportsRangeBucket(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType | _: DecimalType | StringType => true
      case _ => false
    }
  }

  /** Key dtypes whose VALUES the scan may do arithmetic on (key-distance
    * RANGE windows cast to long): the numeric subset of
    * [[supportsRangeBucket]] — strings bucket fine but have no distance. */
  def supportsRangeArith(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           DateType | TimestampType | _: DecimalType => true
      case _ => false
    }
  }

  /** Numeric proxy of an orderable key (approxQuantile needs numeric):
    * monotone in the key, so range buckets over it are range buckets over
    * the key. Only dtypes passing [[supportsRangeBucket]] have a monotone
    * proxy — anything else is a hard error, not a silent reorder. */
  private def numericKey(df: DataFrame, keyCol: String): Column = {
    val dt = df.schema(keyCol).dataType
    require(supportsRangeBucket(dt),
      s"OrderedScan needs a numeric/date/timestamp key; '$keyCol' is $dt " +
        "(cast-to-double is not monotone in its natural order)")
    dt match {
      case org.apache.spark.sql.types.DateType =>
        datediff(col(keyCol), lit("1970-01-01")).cast("double")
      case _ => col(keyCol).cast("double")
    }
  }

  /** Sampled boundary keys for orderable-but-non-numeric (string) keys:
    * a fixed-seed takeSample (driver-sized — `buckets`×128 keys), sorted,
    * thinned to `buckets-1` cut points. Boundaries need only be BALANCED,
    * not exact quantiles — bucket assignment compares with the key's own
    * `<=`, so order-correctness never depends on the sample. */
  private def sampledStringCuts(
      df: DataFrame, keyCol: String, buckets: Int): Array[String] = {
    val sample = df.select(col(keyCol)).where(col(keyCol).isNotNull)
      .rdd.takeSample(withReplacement = false, num = buckets * 128, seed = 42L)
      .map(_.getString(0)).sorted(utf8Ordering)
    if (sample.isEmpty) Array.empty
    else (1 until buckets)
      .map(i => sample(math.min((i.toLong * sample.length / buckets).toInt, sample.length - 1)))
      .distinct.sorted(utf8Ordering).toArray
  }

  /** Driver-side string ordering that matches Spark's UTF8_BINARY (UTF-8
    * byte) comparison. JVM `String.compareTo` compares UTF-16 code units,
    * which disagrees with UTF-8 byte order for supplementary-plane
    * characters — mis-ordered cut points would break the
    * buckets-are-ordered-ranges invariant the stitches rely on. */
  private val utf8Ordering: Ordering[String] =
    Ordering.comparatorToOrdering(new java.util.Comparator[String] {
      def compare(a: String, b: String): Int =
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    })

  /** Assign a range-bucket id column `__bucket` (-1..buckets): numeric/
    * date/timestamp keys use approx-quantile boundaries of the monotone
    * numeric proxy; string keys use sampled boundary KEYS compared
    * lexicographically (exact natural order, no proxy). Rows with equal
    * keys always land in the same bucket (boundaries are key values).
    * Null keys get bucket -1 — BEFORE every data bucket — matching the
    * nulls-first order of the single-window form (`Window.orderBy` asc)
    * these scans reproduce (the samplers ignore nulls, so they'd otherwise
    * fall through the `<=` chain into the LAST bucket and diverge). */
  /** `string_prefix64(keyCol)` as a Column: the key's first 8 UTF-8 bytes
    * as a signed order-isomorphic long (weakly monotone in UTF8 binary
    * order — see [[graft.plans.StringPrefix64]]). */
  private[graft] def prefix64(keyCol: String): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.plans.StringPrefix64(
        org.apache.spark.sql.GraftShim.expression(col(keyCol))))

  /** MEASURED bucket sizing (r15): the requested count is a FLOOR; the
    * count rises with the input's REAL row count (~128Ki rows per bucket,
    * cap 256) so each within-bucket window SORT stays inside the
    * execution-memory slice at any amplification. The r14 100× drill
    * measured why this matters: 64 buckets hashed into 32 shuffle
    * partitions gave ~2M-row per-task sorts, and ordered_fill /
    * ordered_rank_str spilled 1.5-3 GB exactly there. Semantics are
    * bucket-count-free (the stitches are exact for any count), so
    * auto-raising is always sound; the cross-bucket carry stays
    * model-sized (≤256 rows).
    *
    * The row count comes from the SAME single aggregation pass that
    * computes the quantile cut grid — NOT from plan statistics: Spark's
    * size-only estimation is a product for inner joins and a
    * localCheckpoint preserves the pre-checkpoint estimate, so a ~30k-row
    * post-join frame can "weigh" 13 GB (measured on q109 — the rejected
    * stats-based draft sized its packing stitch to 1024 partitions off
    * that phantom weight and tripled the query; measured rows replaced
    * stat-bytes for exactly this reason). One fixed 255-point grid is
    * sketched per call and thinned to the sized cut count, so the pass
    * count is unchanged from the old approxQuantile form.
    *
    * The 256 cap keeps the exchange inside the BYPASS-merge shuffle
    * writer's comfort zone (per-map-task open-file buffers are
    * partitions × spark.shuffle.file.buffer); the graft session builders
    * raise spark.shuffle.sort.bypassMergeThreshold to 2048 to cover it —
    * above the threshold the sort-based writer's map-side sort simply
    * MOVES the spill to the map side (measured at 4× over-partitioning).
    * 256 buckets × 128Ki rows ≈ 33M rows before buckets grow past 128Ki
    * rows each; the grid has [[gridPoints]] = 255 cut candidates, so
    * [[sizedCount]] clamps to gridPoints + 1 — a request above it would
    * overstate the real bucket count and (on the string path) spuriously
    * trip the diversity gate into the 64-cut fallback. */
  private val rowsPerBucket = 128L << 10
  private val maxBuckets = 256
  private val gridPoints = 255

  /** One pass over `proxyCol`: (row count incl. null keys, fine quantile
    * grid of the non-null proxy). Returns an empty grid for an empty or
    * all-null input (single bucket 0 downstream).
    *
    * The grid sketch ingests a ~10% BERNOULLI SAMPLE of the proxy, not
    * every row (r16): cut points only steer BALANCE — the stitches are
    * exact for any bucketing — and the full-column percentile sketch was
    * the measured bottleneck of the sizing pass (100× rank_str profile:
    * 24.4 s sizing, 11.5 s of it the sketch over 60M proxies; sampled,
    * the sketch sees 6M and the pass drops to ~15 s). `count` still sees
    * every row, so the SIZING stays exact. rand(42) is deterministic per
    * partition layout, and a different sample on a different layout only
    * moves boundaries, never results. The sample column is projected
    * BELOW the aggregate (nondeterministic expressions can't appear in
    * aggregate arguments). Inputs too small for the sample to yield
    * enough distinct cuts fall out exactly like genuinely coarse grids
    * always have: fewer (still exact) buckets, or the string path's
    * sampled-cut fallback — both sub-second shapes at those sizes. */
  private val gridSampleP = 0.1
  private def countAndGrid(df: DataFrame, proxyCol: String): (Long, Array[Double]) = {
    val probes = (1 to gridPoints).map(_.toDouble / (gridPoints + 1))
    val r = df
      .select(when(rand(42) <= gridSampleP, col(proxyCol)).as("__samp"))
      .agg(
        count(lit(1)).as("__n"),
        percentile_approx(col("__samp"),
          typedLit(probes), lit(512)).as("__g")).head()
    val n = r.getLong(0)
    val grid =
      if (r.isNullAt(1)) Array.empty[Double]
      else r.getSeq[Double](1).toArray
    (n, grid)
  }

  private def sizedCount(rows: Long, requested: Int): Int =
    math.min(gridPoints + 1,
      math.max(requested, math.min(maxBuckets.toLong, rows / rowsPerBucket + 1).toInt))

  /** Thin the fine grid to `nb - 1` distinct sorted cut points. */
  private def thinGrid(grid: Array[Double], nb: Int): Array[Double] =
    if (grid.isEmpty) grid
    else (1 until nb)
      .map(j => grid(math.min(grid.length - 1, j * (grid.length + 1) / nb - 1).max(0)))
      .distinct.sorted.toArray

  def withRangeBucket(df: DataFrame, keyCol: String, buckets: Int): DataFrame = {
    // hand every bucket its OWN task up front: Window.partitionBy(__bucket)
    // alone exchanges into spark.sql.shuffle.partitions tasks (32), so at
    // amplified scale each task sorted MULTIPLE buckets' rows and the sort
    // spilled; an explicit hash repartition on the bucket id (preserved by
    // the planner — it already satisfies the window's ClusteredDistribution,
    // and AQE never coalesces an explicit-count repartition) keeps the
    // per-task sort at one-ish buckets for any input size. Downstream
    // windows/groupBys on __bucket reuse this exchange — same shuffle
    // count as before, smaller and spill-free sorts.
    val (b, nb, rows) = withRangeBucketSized(df, keyCol, buckets)
    // partition count follows MEASURED need, not the bucket floor: on a
    // small input the old behavior (window exchange into
    // spark.sql.shuffle.partitions) is exactly right and extra tasks are
    // pure scheduler overhead (measured +0.2 s on sub-second queries); on
    // a large input every bucket gets its own task
    val needed = sizedCount(rows, 1)
    val parts = math.min(nb,
      math.max(df.sparkSession.sessionState.conf.numShufflePartitions, needed))
    b.repartition(parts, col("__bucket"))
  }

  /** Binary-search bucket assignment over sorted double cuts: one
    * [[graft.plans.BucketSearch]] expression, O(log buckets) per row in
    * whole-stage codegen — a when-chain is O(buckets) per row, which the
    * statistics-sized counts turned into the dominant scan cost. */
  private def searchBucket(proxy: Column, cuts: Array[Double]): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.plans.BucketSearch(
        org.apache.spark.sql.GraftShim.expression(proxy), cuts))

  private def withRangeBucketSized(
      df: DataFrame, keyCol: String, buckets: Int): (DataFrame, Int, Long) = {
    if (df.schema(keyCol).dataType == org.apache.spark.sql.types.StringType) {
      // PREFIX FAST PATH: bucket on the order-isomorphic 8-byte long
      // prefix of the key instead of the string. Sound because prefix64
      // is weakly monotone in key order — bucketing by ANY monotone
      // coarsening keeps buckets as ordered contiguous key ranges with
      // equal keys together, which is the only invariant the stitches
      // need. Boundaries come from ONE (count + fine-quantile-grid) pass
      // over the prefix cast to double (cast is weakly monotone too;
      // boundaries only need BALANCE, never exactness); assignment is a
      // per-row binary search inside whole-stage codegen.
      val keyed = df.withColumn("__kpfxd", prefix64(keyCol).cast("double"))
      val (rows, grid) = countAndGrid(keyed, "__kpfxd")
      val nb = sizedCount(rows, buckets)
      val cutsD = thinGrid(grid, nb)
      // diversity gate: when the sampled prefixes can't separate at least
      // half the requested cuts (keys sharing ≥8 leading bytes — URLs
      // under one host, padded codes), fall back to exact sampled STRING
      // cut points (slower, but balanced regardless of shared prefixes)
      if (cutsD.length >= math.max(1, (nb - 1) / 2)) {
        (keyed.withColumn("__bucket",
          when(col(keyCol).isNull, lit(-1))
            .otherwise(searchBucket(col("__kpfxd"), cutsD))).drop("__kpfxd"),
          nb, rows)
      } else {
        // degenerate-prefix fallback: a per-row UTF8-comparison when-chain,
        // capped at 64 cuts regardless of the sized count — at hundreds of
        // string cuts the chain itself becomes the scan bottleneck (259 s
        // vs 75 s measured on the 100× rank drill when a fallback fired at
        // a sized count), and 64 balanced-but-bigger buckets beat that
        val fbBuckets = math.min(nb, 64)
        val cuts = sampledStringCuts(df, keyCol, fbBuckets)
        val bucketExpr = cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
          case ((cut, i), elseExpr) => when(col(keyCol) <= lit(cut), i).otherwise(elseExpr)
        }
        (df.withColumn("__bucket",
          when(col(keyCol).isNull, lit(-1)).otherwise(bucketExpr)),
          fbBuckets, rows)
      }
    } else {
      val keyed = df.withColumn("__knum", numericKey(df, keyCol))
      val (rows, grid) = countAndGrid(keyed, "__knum")
      val nb = sizedCount(rows, buckets)
      val cuts = thinGrid(grid, nb)
      (keyed.withColumn("__bucket",
        when(col("__knum").isNull, lit(-1))
          .otherwise(searchBucket(col("__knum"), cuts))).drop("__knum"),
        nb, rows)
    }
  }

  /** max_by/min_by ordering proxy over the key, null-safe for the all-null
    * bucket (-1): numeric keys use the monotone numeric proxy; string keys
    * order natively (nulls coalesce to "" — only bucket -1 holds nulls, so
    * the coalesce never crosses buckets). */
  private def ordProxyOf(df: DataFrame, keyCol: String): Column =
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.StringType => coalesce(col(keyCol), lit(""))
      case _ => coalesce(numericKey(df, keyCol), lit(Double.MinValue))
    }

  /** Global forward fill of `valueCols` in key order, distributed.
    * Same semantics as KSeries.fillForward with no partition keys. */
  def forwardFill(
      df: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = valueCols.foldLeft(b) { (d, c) =>
      d.withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wIn))
    }
    // one row per bucket: the last filled value of each column = the running
    // fill at the bucket's max key. Ordering proxy is null-safe (max_by over
    // an all-null key — the null-key bucket — would itself return null and
    // drop the carry).
    val ordProxy = ordProxyOf(within, keyCol)
    val lastAggs = valueCols.map(c => max_by(col(s"__f_$c"), ordProxy).as(s"__last_$c"))
    val summary = within.groupBy(col("__bucket")).agg(lastAggs.head, lastAggs.tail: _*)
    // carry-in for bucket i = last non-null among buckets < i (tiny window)
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = valueCols.foldLeft(summary) { (d, c) =>
      d.withColumn(s"__carry_$c", last(col(s"__last_$c"), ignoreNulls = true).over(wCarry))
    }.select(col("__bucket") +: valueCols.map(c => col(s"__carry_$c")): _*)

    val joined = within.join(broadcast(carry), Seq("__bucket"), "left_outer")
    val outCols = df.columns.toSeq.map {
      case c if valueCols.contains(c) => coalesce(col(s"__f_$c"), col(s"__carry_$c")).as(c)
      case c => col(c)
    }
    joined.select(outCols: _*)
  }

  /** Global running aggregate (cumulative sum) of `valueCol` in key order,
    * distributed. Appends `cumCol`. */
  def runningSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      cumCol: String,
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = b.withColumn("__cum", sum(col(valueCol)).over(wIn))
    val summary = within.groupBy(col("__bucket")).agg(sum(col(valueCol)).as("__total"))
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary
      .withColumn("__offset", coalesce(sum(col("__total")).over(wCarry), lit(0.0)))
      .select(col("__bucket"), col("__offset"))
    within.join(broadcast(carry), Seq("__bucket"), "left_outer")
      .select(df.columns.map(col) :+
        (col("__cum") + col("__offset")).as(cumCol): _*)
  }

  /** [[runningSum]] generalized to SEVERAL exact-LONG columns in ONE
    * stitched pass: each (valueCol -> outCol) pair gets its global
    * running sum, all riding the same bucket shuffle, within-bucket
    * window sort and per-bucket carry broadcast — callers that need two
    * aligned cumulatives (two-sample ECDFs, paired quota scans) pay one
    * scan instead of two, and integer sums keep the result hash-exact
    * cross-engine (no double accumulation anywhere). */
  def runningSumsLong(
      df: DataFrame,
      keyCol: String,
      sums: Seq[(String, String)],
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = sums.zipWithIndex.foldLeft(b) { case (d, ((v, _), i)) =>
      d.withColumn(s"__cum$i", sum(col(v).cast("long")).over(wIn))
    }
    val summary = b.groupBy(col("__bucket")).agg(
      sums.head._1 match { case v => sum(col(v).cast("long")).as("__tot0") },
      sums.tail.zipWithIndex.map { case ((v, _), i) =>
        sum(col(v).cast("long")).as(s"__tot${i + 1}")
      }: _*)
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = sums.indices.foldLeft(summary) { case (d, i) =>
      d.withColumn(s"__off$i",
        coalesce(sum(col(s"__tot$i")).over(wCarry), lit(0L)))
    }.select(col("__bucket") +: sums.indices.map(i => col(s"__off$i")): _*)
    within.join(broadcast(carry), Seq("__bucket"), "left_outer")
      .select(df.columns.map(col) ++ sums.zipWithIndex.map {
        case ((_, out), i) => (col(s"__cum$i") + col(s"__off$i")).as(out)
      }: _*)
  }

  /** Global backward fill — [[forwardFill]] mirrored (desc within buckets,
    * carry-in from later buckets). */
  def backwardFill(
      df: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = valueCols.foldLeft(b) { (d, c) =>
      d.withColumn(s"__f_$c", last(col(c), ignoreNulls = true).over(wIn))
    }
    val ordProxy = ordProxyOf(within, keyCol)
    val lastAggs = valueCols.map(c => min_by(col(s"__f_$c"), ordProxy).as(s"__last_$c"))
    val summary = within.groupBy(col("__bucket")).agg(lastAggs.head, lastAggs.tail: _*)
    val wCarry = Window.orderBy(col("__bucket").desc).rowsBetween(Window.unboundedPreceding, -1)
    val carry = valueCols.foldLeft(summary) { (d, c) =>
      d.withColumn(s"__carry_$c", last(col(s"__last_$c"), ignoreNulls = true).over(wCarry))
    }.select(col("__bucket") +: valueCols.map(c => col(s"__carry_$c")): _*)
    val joined = within.join(broadcast(carry), Seq("__bucket"), "left_outer")
    val outCols = df.columns.toSeq.map {
      case c if valueCols.contains(c) => coalesce(col(s"__f_$c"), col(s"__carry_$c")).as(c)
      case c => col(c)
    }
    joined.select(outCols: _*)
  }

  /** Global positional shift of `valueCols` by `offset` rows in key order,
    * distributed: global row numbers (one bucket shuffle + broadcast) and a
    * self-equi-join on the shifted position. Two shuffles total — never a
    * single-task global window. Null where the source position falls off
    * either end (same as `lag`/`lead`). */
  def shift(
      df: DataFrame,
      keyCol: String,
      valueCols: Seq[String],
      offset: Int,
      buckets: Int = 64): DataFrame = {
    val rn = rowNumber(df, keyCol, "__g", buckets)
    val src = rn.select((col("__g") + offset).as("__g") +:
      valueCols.map(c => col(c).as(s"__s_$c")): _*)
    rn.join(src, Seq("__g"), "left_outer")
      .select(df.columns.toSeq.map {
        case c if valueCols.contains(c) => col(s"__s_$c").as(c)
        case c => col(c)
      }: _*)
  }

  /** Distributed EWMA — the recurrence y_i = α·x_i + (1-α)·y_{i-1}
    * (y_1 = x_1) over global key order, computed EXACTLY without a global
    * window or driver loop. A sequential recurrence looks unparallelizable,
    * but it is linear in the carry: within a bucket of m rows,
    * y_end = w + d·y_in with w = the bucket's zero-seeded EWMA tail and
    * d = (1-α)^m. So: (1) one pass computes per-bucket (w, d) in parallel;
    * (2) the tiny per-bucket recurrence (≤ `buckets` rows) runs on the
    * driver; (3) a second pass re-scans each bucket seeded with its
    * carry-in. The stitch is algebraically exact; floating-point-wise the
    * carry combination reorders a handful of additions, so results can
    * differ from a strict sequential loop in the last ulps (≈1e-15
    * relative per boundary — asserted ≤1e-12 overall in OrderedScanSpec).
    * Rows with null `valueCol` are dropped (EWMA is undefined over gaps;
    * realign/fill first if needed). Output: (keyCol, outCol). */
  def ewma(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      alpha: Double,
      outCol: String,
      buckets: Int = 64): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0,1]")
    val spark = df.sparkSession
    val b = withRangeBucket(
      df.select(col(keyCol), col(valueCol)).where(col(valueCol).isNotNull),
      keyCol, buckets)
    // localCheckpoint (not cache): both passes read it, and the blocks are
    // released by the ContextCleaner when the result is GC'd — cache()
    // would pin an entry per ewma() call for the session lifetime
    // b is already hash-partitioned one-ish buckets per task by
    // withRangeBucket (measured sizing) — only the in-partition sort is
    // needed here; a second repartition at the requested count would
    // collapse the sizing
    val sorted = b
      .sortWithinPartitions(col("__bucket"), col(keyCol))
      .select(col("__bucket").cast("int"), col(keyCol), col(valueCol).cast("double"))
      .localCheckpoint(true)

    // pass 1: per bucket, (w0 = zero-seeded end value, wInit = first-row-
    // init end value, d = (1-α)^m). A partition may hold several buckets —
    // state resets on bucket change.
    val summaries = sorted.rdd.mapPartitions { iter =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Double)]
      var cur = Int.MinValue
      var w0 = 0.0; var wInit = 0.0; var d = 1.0; var first = true
      def flush(): Unit = if (cur != Int.MinValue) out += ((cur, w0, wInit, d))
      iter.foreach { r =>
        val bk = r.getInt(0); val x = r.getDouble(2)
        if (bk != cur) { flush(); cur = bk; w0 = 0.0; wInit = 0.0; d = 1.0; first = true }
        w0 = alpha * x + (1 - alpha) * w0
        wInit = if (first) x else alpha * x + (1 - alpha) * wInit
        d *= (1 - alpha)
        first = false
      }
      flush()
      out.iterator
    }.collect().sortBy(_._1)

    // tiny cross-bucket recurrence: carry-IN per bucket. "No carry yet" is
    // tracked with an explicit flag, NOT a NaN sentinel — a legitimate NaN
    // data value must poison the recurrence forward (exactly like a
    // sequential loop would), not be mistaken for "reseed here".
    val carryIn = scala.collection.mutable.Map.empty[Int, Double]
    var carry = 0.0
    var hasCarry = false
    summaries.foreach { case (bk, w0, wInit, d) =>
      if (hasCarry) carryIn(bk) = carry
      carry = if (!hasCarry) wInit else w0 + d * carry
      hasCarry = true
    }
    val bcCarry = spark.sparkContext.broadcast(carryIn.toMap)

    // pass 2: re-scan each bucket seeded with its exact carry-in (buckets
    // absent from the map start fresh; same flag discipline as above)
    val keyIdx = 1
    val outRdd = sorted.rdd.mapPartitions { iter =>
      val carries = bcCarry.value
      var cur = Int.MinValue
      var y = 0.0
      var hasY = false
      iter.map { r =>
        val bk = r.getInt(0); val x = r.getDouble(2)
        if (bk != cur) {
          cur = bk
          carries.get(bk) match {
            case Some(c) => y = c; hasY = true
            case None => hasY = false
          }
        }
        y = if (!hasY) x else alpha * x + (1 - alpha) * y
        hasY = true
        org.apache.spark.sql.Row(r.get(keyIdx), y)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      sorted.schema(1).copy(name = keyCol),
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(outRdd, schema)
  }

  /** Per-group EWMA — the common 100 TB shape (per-symbol, per-user):
    * groups are independent, so one shuffle on the group key + a sequential
    * scan within each sorted group computes the recurrence exactly, fully
    * parallel across groups. Unlike [[ewma]]'s global stitch this is a
    * straight loop — bit-identical to any engine's sequential recurrence,
    * hence DuckDB-oracle-exact. Null values dropped. Output:
    * (groupCol, keyCol, outCol). */
  def ewmaByGroup(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      valueCol: String,
      alpha: Double,
      outCol: String): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha $alpha outside (0,1]")
    val spark = df.sparkSession
    val sorted = df.select(col(groupCol), col(keyCol), col(valueCol).cast("double"))
      .where(col(valueCol).isNotNull)
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(keyCol))
    val outRdd = sorted.rdd.mapPartitions { iter =>
      var cur: Any = null
      var started = false
      var y = 0.0
      iter.map { r =>
        val g = r.get(0)
        if (!started || g != cur) { cur = g; started = true; y = r.getDouble(2) }
        else y = alpha * r.getDouble(2) + (1 - alpha) * y
        org.apache.spark.sql.Row(g, r.get(1), y)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      sorted.schema(0), sorted.schema(1),
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(outRdd, schema).toDF(groupCol, keyCol, outCol)
  }

  /** Plan-size + dtype gate shared by every unpartitioned ordered op that
    * can delegate here (shift/diff/fill in KSeries, the sliding-window
    * family in Windowing): above `spark.graft.globalWindow.maxBytes` a
    * global `Window.orderBy` would serialize the whole series through ONE
    * task, so the op takes the partition-stitched form instead. Plan-time
    * decision from Catalyst statistics — no job runs to decide. Keys
    * qualify when they have an order-exact bucket path
    * ([[supportsRangeBucket]]): numeric/date/timestamp via the monotone
    * proxy, strings via sampled lexicographic boundaries. */
  def autoRoutes(df: DataFrame, keyCol: String): Boolean = {
    val maxBytes = df.sparkSession.conf
      .get("spark.graft.globalWindow.maxBytes", DefaultGlobalWindowMaxBytes.toString).toLong
    supportsRangeBucket(df.schema(keyCol).dataType) &&
      df.queryExecution.optimizedPlan.stats.sizeInBytes > maxBytes
  }

  /** Default size above which unpartitioned ordered ops delegate here.
    * 32 MiB: comfortably one window task below it, a single-task bottleneck
    * above. */
  val DefaultGlobalWindowMaxBytes: Long = 32L << 20

  /** Per-bucket layout collected to the driver (bucket-count-sized, tiny):
    * non-empty bucket ids in scan order, each with its global start
    * position. The basis of the bounded-overlap stitch: a row knows its
    * global position from (bucket start + within-bucket rank), and which
    * successor buckets need a warm-up copy of it from the starts array. */
  private final case class BucketLayout(
      denseOf: Map[Int, Int], startOf: Map[Int, Long], starts: Seq[Long], total: Long)

  private def bucketLayout(b: DataFrame, descending: Boolean): BucketLayout = {
    val counts = b.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val sorted = if (descending) counts.sortBy(-_._1) else counts.sortBy(_._1)
    val cum = sorted.map(_._2).scanLeft(0L)(_ + _)
    val starts = cum.dropRight(1).toSeq
    val denseOf = sorted.map(_._1).zipWithIndex.toMap
    BucketLayout(denseOf, denseOf.map { case (bk, j) => bk -> starts(j) }, starts, cum.last)
  }

  /** Distributed sliding count-window of size `n` — the 100× path for an
    * unpartitioned `Series.windowInto`. Bounded-overlap stitch:
    *   1. range-bucket the series ([[withRangeBucket]]);
    *   2. global position `g` = within-bucket rank + bucket start (starts
    *      from a tiny per-bucket count, collected driver-side);
    *   3. ship a warm-up COPY of each row to every later bucket whose start
    *      lies within n-1 positions of it — ≤ (n-1)·buckets extra rows
    *      total, and a bucket smaller than n-1 simply forwards through
    *      several successors (multi-bucket spans stay exact);
    *   4. window WITHIN each target bucket ordered by `g` — every kept
    *      row's frame holds exactly its n global predecessors — then drop
    *      the warm-up copies.
    * Two bucket-key shuffles + two tiny driver actions; never a single-task
    * global window. `descending=true` gives the forward-anchored variant
    * (windowIntoForward): same machinery over reversed scan order.
    * Output: (keyCol, outCol) with reference Boundary semantics; rows with
    * equal keys have the same tie nondeterminism as `Window.orderBy`. */
  def slidingAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      n: Int,
      boundary: Boundary,
      agg: Column => Column,
      outCol: String,
      buckets: Int = 64,
      descending: Boolean = false): DataFrame = {
    require(n >= 1, s"window size $n must be >= 1")
    val base = df.select(col(keyCol), col(valueCol))
    val b = withRangeBucket(base, keyCol, buckets)
    val lay = bucketLayout(b, descending)
    val ord = if (descending) col(keyCol).desc else col(keyCol).asc
    val wIn = Window.partitionBy(col("__bucket")).orderBy(ord)
    val d = (n - 1).toLong
    val withG = b
      .withColumn("__rn", row_number().over(wIn).cast("long") - 1)
      .withColumn("__g", col("__rn") + element_at(typedLit(lay.startOf), col("__bucket")))
    val copies = size(filter(typedLit(lay.starts),
      a => a > col("__g") && a <= col("__g") + d))
    val exploded = withG
      .withColumn("__dense", element_at(typedLit(lay.denseOf), col("__bucket")))
      .withColumn("__copy", explode(sequence(lit(0), copies)))
      .withColumn("__target", col("__dense") + col("__copy"))
    // identical frame SET either way (trailing n rows in scan position g) —
    // but the frame must present rows in ASCENDING KEY order so
    // order-sensitive aggregates (first/last/collect_list) match the
    // single-window form: ascending scans order by g asc with a trailing
    // frame; descending scans (g counts down the key order) order by g
    // DESC with a leading frame, which is the same set read key-ascending.
    val w2 =
      if (descending)
        Window.partitionBy(col("__target")).orderBy(col("__g").desc)
          .rowsBetween(0, n - 1)
      else
        Window.partitionBy(col("__target")).orderBy(col("__g"))
          .rowsBetween(-(n - 1), 0)
    val out = exploded.select(
        col(keyCol),
        agg(col(valueCol)).over(w2).as(outCol),
        count(lit(1)).over(w2).as("__cnt"),
        col("__copy"))
      .where(col("__copy") === 0)
    boundary match {
      case Boundary.Skip => out.where(col("__cnt") === n).select(col(keyCol), col(outCol))
      case _             => out.select(col(keyCol), col(outCol))
    }
  }

  /** Distributed key-distance (RANGE) window — the 100× path for an
    * unpartitioned `Series.windowDistInto`: frame = all rows with key in
    * (k - dist, k]. Same stitch as [[slidingAgg]] with the key itself as
    * the position: a row is warm-up-copied to every later bucket whose MIN
    * key lies within dist-1 of it (per-bucket min keys are the tiny
    * driver-side table). RANGE frames include key peers, so ties are
    * deterministic. Output: (keyCol, outCol). */
  def slidingRangeAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      dist: Long,
      agg: Column => Column,
      outCol: String,
      buckets: Int = 64): DataFrame = {
    require(dist >= 1, s"window distance $dist must be >= 1")
    require(supportsRangeArith(df.schema(keyCol).dataType),
      s"key-distance windows need a numeric/date/timestamp key; " +
        s"'$keyCol' is ${df.schema(keyCol).dataType}")
    // Bucket on the LONG-CAST key, not the raw key: every piece of frame
    // arithmetic below (positions, per-bucket mins, the warm-up-copy
    // predicate) runs on __p, and the single-window form this stitch must
    // match orders by the same cast (Windowing.windowDistInto). Bucketing
    // the raw key would let long-EQUAL peers (e.g. 100.4 and 100.6)
    // straddle a boundary, where the strict `a > __p` copy predicate skips
    // them and frames near boundaries silently miss RANGE peers.
    val base = df.select(col(keyCol), col(valueCol))
      .withColumn("__p", col(keyCol).cast("long"))
    val b = withRangeBucket(base, "__p", buckets)
    // per-bucket min key (bucket-count-sized). The null-key bucket maps to
    // Long.MinValue: it sorts first and must never receive warm-up copies.
    val minsByBucket = b.groupBy(col("__bucket")).agg(min(col("__p")).as("__mk"))
      .collect().map(r => (r.getInt(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1)))
      .sortBy(_._1)
    val denseOf = minsByBucket.map(_._1).zipWithIndex.toMap
    val mins = minsByBucket.map(_._2).toSeq
    val d = dist - 1
    val withP = b
    val copies = when(col("__p").isNull, lit(0)).otherwise(
      size(filter(typedLit(mins), a => a > col("__p") && a <= col("__p") + d)))
    val exploded = withP
      .withColumn("__dense", element_at(typedLit(denseOf), col("__bucket")))
      .withColumn("__copy", explode(sequence(lit(0), copies)))
      .withColumn("__target", col("__dense") + col("__copy"))
    val w2 = Window.partitionBy(col("__target")).orderBy(col("__p"))
      .rangeBetween(-d, 0)
    exploded.select(col(keyCol), agg(col(valueCol)).over(w2).as(outCol), col("__copy"))
      .where(col("__copy") === 0)
      .select(col(keyCol), col(outCol))
  }

  /** Distributed fixed chunking — the 100× path for an unpartitioned
    * `Series.chunkInto`: chunk id = global position ÷ n (AtBeginning aligns
    * chunks to the END, so the incomplete chunk comes first — computed from
    * the total count, which the stitch already collected). No window at
    * all: one bucket shuffle for ranks + one map-side-partial groupBy on
    * the chunk id. Output: (keyCol = chunk's min key, agg columns). */
  def chunkAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      n: Int,
      boundary: Boundary,
      aggs: Seq[(Column => Column, String)],
      buckets: Int = 64): DataFrame = {
    require(n >= 1, s"chunk size $n must be >= 1")
    val base = df.select(col(keyCol), col(valueCol))
    val b = withRangeBucket(base, keyCol, buckets)
    val lay = bucketLayout(b, descending = false)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    val withG = b
      .withColumn("__rn", row_number().over(wIn).cast("long") - 1)
      .withColumn("__g", col("__rn") + element_at(typedLit(lay.startOf), col("__bucket")))
    // non-negative operands, so truncation == floor
    val chunk = boundary match {
      case Boundary.AtBeginning => -((lit(lay.total - 1) - col("__g")) / n).cast("long")
      case _                    => (col("__g") / n).cast("long")
    }
    val aggExprs = min(col(keyCol)).as(keyCol) +:
      aggs.map { case (f, name) => f(col(valueCol)).as(name) } :+
      count(lit(1)).as("__sz")
    val grouped = withG.withColumn("__chunk", chunk)
      .groupBy(col("__chunk"))
      .agg(aggExprs.head, aggExprs.tail: _*)
    val kept = if (boundary == Boundary.Skip) grouped.where(col("__sz") === n) else grouped
    kept.drop("__sz", "__chunk")
  }

  /** Global 0-based row number in key order, distributed. Appends `ordCol`.
    * The scale path behind indexRowsOrdinally / positional GetAt. */
  def rowNumber(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    // String keys sort by (prefix64, key) — the same total order, but the
    // window's sort comparator (whose Tungsten sort-prefix lands on the
    // USELESS first sort column, the per-partition-constant __bucket)
    // decides almost every comparison on an 8-byte load instead of a
    // UTF8String byte walk. Costs 8 bytes/row of shuffle width; the r12
    // drill's ordered_rank_str kernel was exactly this comparator.
    val isStr = df.schema(keyCol).dataType == org.apache.spark.sql.types.StringType
    val wIn =
      if (isStr) Window.partitionBy(col("__bucket")).orderBy(col("__kpfx"), col(keyCol))
      else Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    val keyedB = if (isStr) b.withColumn("__kpfx", prefix64(keyCol)) else b
    val within = keyedB.withColumn("__rn", row_number().over(wIn).cast("long") - 1)
    val summary = within.groupBy(col("__bucket")).agg(count(lit(1)).as("__n"))
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary
      .withColumn("__offset", coalesce(sum(col("__n")).over(wCarry), lit(0L)))
      .select(col("__bucket"), col("__offset"))
    within.join(broadcast(carry), Seq("__bucket"), "left_outer")
      .select(df.columns.map(col) :+
        (col("__rn") + col("__offset")).as(ordCol): _*)
  }

  /** Global running MIN and MAX of `valueCol` in key order, distributed —
    * the expanding-extrema companion of [[runningSum]]: extrema within
    * buckets, per-bucket (min, max) summary, running extrema over EARLIER
    * buckets broadcast back as the carry (least/greatest skip the null
    * carry of the first bucket). Null values are transparent (Spark window
    * min/max skip them), so a missing-valued row reports the extrema of
    * everything before it. Appends `minCol`/`maxCol`. */
  def runningMinMax(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      minCol: String,
      maxCol: String,
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val within = b
      .withColumn("__mn", min(col(valueCol)).over(wIn))
      .withColumn("__mx", max(col(valueCol)).over(wIn))
    val summary = within.groupBy(col("__bucket"))
      .agg(min(col(valueCol)).as("__bmn"), max(col(valueCol)).as("__bmx"))
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary
      .withColumn("__cmn", min(col("__bmn")).over(wCarry))
      .withColumn("__cmx", max(col("__bmx")).over(wCarry))
      .select(col("__bucket"), col("__cmn"), col("__cmx"))
    within.join(broadcast(carry), Seq("__bucket"), "left_outer")
      .select(df.columns.map(col) :+
        least(col("__mn"), col("__cmn")).as(minCol) :+
        greatest(col("__mx"), col("__cmx")).as(maxCol): _*)
  }

  /** The full expanding-stats family in ONE stitched pass: global row
    * number, running sum, running min and running max of `valueCol` in key
    * order — one bucket shuffle, one within-bucket window sort, one
    * (count, total, min, max) summary carried across buckets. The
    * composition [[rowNumberAndSum]] ∘ [[runningMinMax]] computes the same
    * columns with a second shuffle and window sort; expanding mean/extrema
    * queries should take this fused form. Appends `ordCol` (0-based),
    * `cumCol` (double), `minCol`, `maxCol`. */
  def runningStats(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      valueCol: String,
      cumCol: String,
      minCol: String,
      maxCol: String,
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    val wRows = wIn.rowsBetween(Window.unboundedPreceding, 0)
    val within = b
      .withColumn("__rn", row_number().over(wIn).cast("long") - 1)
      .withColumn("__cum", sum(col(valueCol)).over(wRows))
      .withColumn("__mn", min(col(valueCol)).over(wRows))
      .withColumn("__mx", max(col(valueCol)).over(wRows))
    val summary = within.groupBy(col("__bucket")).agg(
      count(lit(1)).as("__n"), sum(col(valueCol)).as("__total"),
      min(col(valueCol)).as("__bmn"), max(col(valueCol)).as("__bmx"))
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary
      .withColumn("__noff", coalesce(sum(col("__n")).over(wCarry), lit(0L)))
      .withColumn("__soff", coalesce(sum(col("__total")).over(wCarry), lit(0.0)))
      .withColumn("__cmn", min(col("__bmn")).over(wCarry))
      .withColumn("__cmx", max(col("__bmx")).over(wCarry))
      .select(col("__bucket"), col("__noff"), col("__soff"), col("__cmn"), col("__cmx"))
    within.join(broadcast(carry), Seq("__bucket"), "left_outer")
      .select(df.columns.map(col) :+
        (col("__rn") + col("__noff")).as(ordCol) :+
        (col("__cum") + col("__soff")).as(cumCol) :+
        least(col("__mn"), col("__cmn")).as(minCol) :+
        greatest(col("__mx"), col("__cmx")).as(maxCol): _*)
  }

  /** [[rowNumber]] AND [[runningSum]] fused into ONE stitched pass: both
    * derive from the same bucket shuffle and within-bucket window sort, and
    * the per-bucket summary carries (count, total) together — callers that
    * need a global rank plus a running aggregate (vocabulary coverage
    * curves, quota cuts) pay one scan instead of two. Appends `ordCol`
    * (0-based long) and `cumCol` (double, like runningSum). */
  def rowNumberAndSum(
      df: DataFrame,
      keyCol: String,
      ordCol: String,
      valueCol: String,
      cumCol: String,
      buckets: Int = 64): DataFrame = {
    val b = withRangeBucket(df, keyCol, buckets)
    val wIn = Window.partitionBy(col("__bucket")).orderBy(col(keyCol))
    val within = b
      .withColumn("__rn", row_number().over(wIn).cast("long") - 1)
      .withColumn("__cum",
        sum(col(valueCol)).over(wIn.rowsBetween(Window.unboundedPreceding, 0)))
    val summary = within.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__total"))
    val wCarry = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val carry = summary
      .withColumn("__noff", coalesce(sum(col("__n")).over(wCarry), lit(0L)))
      .withColumn("__soff", coalesce(sum(col("__total")).over(wCarry), lit(0.0)))
      .select(col("__bucket"), col("__noff"), col("__soff"))
    within.join(broadcast(carry), Seq("__bucket"), "left_outer")
      .select(df.columns.map(col) :+
        (col("__rn") + col("__noff")).as(ordCol) :+
        (col("__cum") + col("__soff")).as(cumCol): _*)
  }
}
