package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join kinds of the reference (reference src/JoinHelpers.fs:15-29). */
sealed trait JoinKind { def spark: String }
object JoinKind {
  case object Inner extends JoinKind { val spark = "inner" }
  case object Outer extends JoinKind { val spark = "full_outer" }
  case object Left  extends JoinKind { val spark = "left_outer" }
  case object Right extends JoinKind { val spark = "right_outer" }
}

/** Lookup semantics for point lookups / as-of joins
  * (reference src/Indices/LinearIndex.fs:92-148). */
sealed trait Lookup
object Lookup {
  case object Exact extends Lookup
  /** nearest key ≤ requested (as-of / backward) */
  case object NearestSmaller extends Lookup
  /** nearest key ≥ requested (forward) */
  case object NearestGreater extends Lookup
}

/** Union behavior (reference src/Series.fs:346-359). */
sealed trait UnionBehavior
object UnionBehavior {
  case object PreferLeft  extends UnionBehavior
  case object PreferRight extends UnionBehavior
  /** overlapping keys raise an error (reference VectorHelpers.fs:176-180) */
  case object Exclusive   extends UnionBehavior
}

/** A keyed series: the reference's `Series<'K,'V>` (reference
  * src/Series.fs:43-47) re-expressed as a lazy two-column DataFrame plus
  * metadata. `ordered` mirrors the reference's lazily-detected index
  * orderedness (reference src/Indices/LinearIndex.fs:26-43): it is a claim
  * that key order is meaningful, realized physically only when an
  * ordered-only operator runs (sort happens inside that operator's plan, not
  * eagerly). Missing values are SQL nulls in the value column (SURVEY §1.2).
  *
  * Everything here builds a logical plan; nothing executes until an action —
  * the key architectural upgrade over the reference's eager engine
  * (SURVEY §3).
  */
final case class KSeries(
    df: DataFrame,
    keyCol: String = "k",
    valueCol: String = "v",
    ordered: Boolean = false) {

  def k: Column = df(keyCol)
  def v: Column = df(valueCol)

  private def result(d: DataFrame, ord: Boolean = ordered): KSeries =
    KSeries(d, keyCol, valueCol, ord)

  /** Computed values are re-canonicalized like the reference (Select
    * re-normalizes NaN→missing at vector construction, reference
    * src/Vectors/ArrayVector.fs:213-223): a 0/0 produced by a map or a zip
    * is MISSING, not a NaN data value. Only floating-point results need it. */
  private def canonical(d: DataFrame): DataFrame =
    d.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        d.withColumn(valueCol,
          when(isnan(col(valueCol)), lit(null)).otherwise(col(valueCol)))
      case _ => d
    }

  /** Ordered-only ops mirror the reference's hard error on unordered indices
    * (reference src/Indices/LinearIndex.fs:210-211,263-264). */
  private def requireOrdered(op: String): Unit =
    require(ordered, s"$op requires an ordered series (reference LinearIndex.fs:210-211)")

  /** Auto-routing for unpartitioned ordered ops (shift/diff/fill/pairwise):
    * above this estimated plan size, a global `Window.orderBy` would
    * serialize the whole series through ONE task, so the op delegates to
    * the partition-stitched [[graft.operators.OrderedScan]] form (bucket
    * shuffle + broadcast carry) instead. Plan-time decision from Catalyst
    * statistics — no job is run to decide. Tunable via
    * `spark.graft.globalWindow.maxBytes`. Numeric/date/timestamp keys
    * bucket via the monotone numeric proxy; STRING keys bucket via sampled
    * boundary keys compared lexicographically (their natural order — the
    * cast-to-double proxy would reorder '10' before '9', which is why
    * strings get their own exact path, see
    * [[graft.operators.OrderedScan.withRangeBucket]]). */
  private def isLargeForGlobalWindow: Boolean =
    graft.operators.OrderedScan.autoRoutes(df, keyCol)

  // ---- projection / filtering (reference src/Series.fs:229-286) ----

  /** Series.mapValues — missing-propagating map over values. */
  def mapValues(f: Column => Column): KSeries =
    result(canonical(df.select(k.as(keyCol), when(v.isNotNull, f(v)).as(valueCol))))

  /** Series.mapAll — map seeing & producing missingness (no null guard). */
  def mapAll(f: Column => Column): KSeries =
    result(canonical(df.select(k.as(keyCol), f(v).as(valueCol))))

  /** Series.mapKeys — re-key; orderedness invalidated like the reference. */
  def mapKeys(f: Column => Column): KSeries =
    result(df.select(f(k).as(keyCol), v.as(valueCol)), ord = false)

  /** Series.filter — predicate over (key, value), missing rows dropped
    * (reference filters observations, src/Series.fs:230-245). */
  def filter(p: (Column, Column) => Column): KSeries =
    result(df.where(v.isNotNull && p(k, v)))

  /** Series.filterAll — predicate sees missingness. */
  def filterAll(p: (Column, Column) => Column): KSeries =
    result(df.where(p(k, v)))

  /** dropMissing (reference src/SeriesModule.fs:594-595). */
  def dropMissing: KSeries = result(df.where(v.isNotNull))

  // ---- slicing (reference src/Series.fs:111-120, ordered-only) ----

  /** Between — inclusive key-range slice. Catalyst turns this into a scan
    * range predicate (partition pruning / parquet row-group skip at scale). */
  def between(lo: Column, hi: Column): KSeries = {
    requireOrdered("between")
    result(df.where(k >= lo && k <= hi))
  }
  def after(lo: Column): KSeries = { requireOrdered("after"); result(df.where(k > lo)) }
  def before(hi: Column): KSeries = { requireOrdered("before"); result(df.where(k < hi)) }
  def startAt(lo: Column): KSeries = { requireOrdered("startAt"); result(df.where(k >= lo)) }
  def endAt(hi: Column): KSeries = { requireOrdered("endAt"); result(df.where(k <= hi)) }

  // ---- endpoint accessors (reference src/SeriesModule.fs:199-202) ----

  /** Series.firstKey/lastKey/firstValue/lastValue/KeyRange as ONE
    * aggregate row (first_key, last_key, first_value, last_value) — the
    * lazy-engine form: min/max + min_by/max_by in a single partial-
    * aggregable pass, no global sort and no row shipped anywhere but the
    * one merged agg row. Scalar accessors below run it as an action. */
  def firstLast: DataFrame = {
    requireOrdered("firstLast")
    df.where(v.isNotNull).agg(
      min(k).as("first_key"), max(k).as("last_key"),
      min_by(v, k).as("first_value"), max_by(v, k).as("last_value"))
  }

  /** Series.KeyRange — (smallest, largest) key, missing rows included
    * (the reference's KeyRange is an index property, not a value one). */
  def keyRange: DataFrame = {
    requireOrdered("keyRange")
    df.agg(min(k).as("first_key"), max(k).as("last_key"))
  }

  // ONE action for both scalar endpoints (firstValue; lastValue would
  // otherwise re-run the full scan), lazy so construction stays plan-only;
  // an empty / all-missing series errors like the reference
  // Series.firstValue does, instead of silently returning null
  private lazy val firstLastRow: org.apache.spark.sql.Row = {
    val r = firstLast.collect()(0)
    require(!r.isNullAt(0),
      "firstValue/lastValue on an empty or all-missing series (reference " +
        "Series.firstValue throws on empty)")
    r
  }
  /** Series.firstValue (value at the smallest key with a present value). */
  def firstValue: Any = firstLastRow.get(2)
  /** Series.lastValue (value at the largest key with a present value). */
  def lastValue: Any = firstLastRow.get(3)

  // ---- alignment: zip / union / append (reference src/Series.fs:293-359) ----

  /** Series.Zip — align two series by key; values nullable on both sides
    * (reference src/Series.fs:303-335). Returns (key, v1, v2) DataFrame.
    * Equi-join: Catalyst picks broadcast vs sort-merge; at 100 TB both sides
    * shuffle on the key once, which is optimal for a general align. */
  def zip(other: KSeries, kind: JoinKind = JoinKind.Outer): DataFrame = {
    val l = df.select(k.as("k"), v.as("v1"))
    val r = other.df.select(other.k.as("k"), other.v.as("v2"))
    l.join(r, Seq("k"), kind.spark)
  }

  /** Series.ZipInner — inner align, both present (reference src/Series.fs:338-343). */
  def zipInner(other: KSeries): DataFrame =
    zip(other, JoinKind.Inner).where(col("v1").isNotNull && col("v2").isNotNull)

  /** Series.zipAlignInto — align then combine present pairs with op
    * (reference src/SeriesModule.fs:1024-1034). */
  def zipWith(other: KSeries, kind: JoinKind)(op: (Column, Column) => Column): KSeries = {
    val z = zip(other, kind)
    result(canonical(z.select(col("k").as(keyCol),
      when(col("v1").isNotNull && col("v2").isNotNull, op(col("v1"), col("v2")))
        .as(valueCol))), ord = false)
  }

  /** Series.zipAlignInto with a LOOKUP — align the other series' values
    * onto this series' keys (Left) or this onto the other's keys (Right)
    * via exact-or-nearest lookup that SKIPS missing values (reference
    * Series.Zip with Lookup, src/Series.fs:318-343; directional tests
    * tests/FSharp.DataFrame.Tests/Series.fs:294-330), then combine present
    * pairs with `op` (op's first argument is always THIS series' value).
    * Realized as the [[graft.operators.AsOf]] union+window plan — one sort,
    * no per-key probes. Lookup.Exact degenerates to [[zipWith]].
    *
    * PRECONDITION (inherited from AsOf.join): the data-side series must
    * have unique keys — the reference enforces this at index construction
    * (src/Indices/LinearIndex.fs:53-56); here duplicate data keys would
    * tie-break nondeterministically inside the carry window. Use
    * [[graft.core.KFrame.assertUniqueKeys]]-style checking upstream when
    * the input is untrusted (opt-in, it costs a shuffle — SURVEY §7.4.10). */
  def zipAlign(other: KSeries, kind: JoinKind, lookup: Lookup)(
      op: (Column, Column) => Column): KSeries = {
    requireOrdered("zipAlign")
    (kind, lookup) match {
      case (_, Lookup.Exact) => zipWith(other, kind)(op)
      case (JoinKind.Left, _) =>
        val l = df.select(k.as("__pk"), v.as("__pv"))
        val r = other.df.select(other.k.as("__dk"), other.v.as("__dv"))
        val joined = graft.operators.AsOf.join(l, "__pk", r, "__dk", Seq("__dv"), lookup)
        result(canonical(joined.select(col("__pk").as(keyCol),
          when(col("__pv").isNotNull && col("__dv").isNotNull,
            op(col("__pv"), col("__dv"))).as(valueCol))))
      case (JoinKind.Right, _) =>
        // mirror: align THIS onto the other's keys; preserve op's arg order
        other.zipAlign(this, JoinKind.Left, lookup)((otherV, thisV) => op(thisV, otherV))
      case _ =>
        throw new IllegalArgumentException(
          "zipAlign needs JoinKind.Left or Right (reference zipAlignInto)")
    }
  }

  /** Series.Union — key-union merge with overlap policy
    * (reference src/Series.fs:346-359). Exclusive raises on overlap like the
    * reference's LeftOrRight transform — realized as a raise_error expression
    * so the check is distributed, not a driver-side collect. */
  def union(other: KSeries, behavior: UnionBehavior = UnionBehavior.PreferLeft): KSeries = {
    val z = zip(other, JoinKind.Outer)
    val merged = behavior match {
      case UnionBehavior.PreferLeft  => coalesce(col("v1"), col("v2"))
      case UnionBehavior.PreferRight => coalesce(col("v2"), col("v1"))
      case UnionBehavior.Exclusive =>
        when(col("v1").isNotNull && col("v2").isNotNull,
          raise_error(lit("Union: overlapping keys with Exclusive behavior")))
          .otherwise(coalesce(col("v1"), col("v2")))
    }
    result(z.select(col("k").as(keyCol), merged.as(valueCol)), ord = false)
  }

  /** Series.Append — concatenate; duplicate keys are an error in the
    * reference (src/Series.fs:293-300). checkDuplicates=true mirrors that via
    * a distributed assertion; default off at scale (it costs a shuffle),
    * per SURVEY §7.4(10). */
  def append(other: KSeries, checkDuplicates: Boolean = false): KSeries = {
    val u = df.select(k.as(keyCol), v.as(valueCol))
      .unionByName(other.df.select(other.k.as(keyCol), other.v.as(valueCol)))
    val checked =
      if (!checkDuplicates) u
      else {
        val w = Window.partitionBy(col(keyCol))
        u.select(col(keyCol), col(valueCol), count(lit(1)).over(w).as("__n"))
          .select(col(keyCol),
            when(col("__n") > 1, raise_error(lit("Append: duplicate keys")))
              .otherwise(col(valueCol)).as(valueCol))
      }
    result(checked, ord = false)
  }

  /** Series.Realign — reindex to an exact new key set; missing where absent
    * (reference src/Series.fs:552-559). */
  def realign(keys: DataFrame, keysCol: String): KSeries = {
    val kk = keys.select(col(keysCol).as(keyCol))
    result(kk.join(df.select(k.as(keyCol), v.as(valueCol)), Seq(keyCol), "left_outer"),
      ord = false)
  }

  // ---- stats (reference src/SeriesModule.fs:27-98) ----
  // All null-skipping like the reference's missing-skipping aggregates;
  // sdv is SAMPLE std-dev (reference uses MathNet sample sdv, SURVEY §7.4(7)).

  def stats(aggs: (Column, String)*): DataFrame =
    df.agg(aggs.head._1.as(aggs.head._2),
      aggs.tail.map { case (c, n) => c.as(n) }: _*)

  def sum: DataFrame = stats((org.apache.spark.sql.functions.sum(v), "sum"))
  def mean: DataFrame = stats((avg(v), "mean"))
  def sdv: DataFrame = stats((stddev_samp(v), "sdv"))
  /** exact median for oracle parity (SURVEY §7.4: percentile, not approx). */
  def exactMedian: DataFrame = stats((percentile(v, lit(0.5)), "median"))

  /** Exact interpolated quantiles at the given probabilities — columns
    * p25/p50/... Exact `percentile` SORTS the values per group; right for
    * parity tests and small-to-medium data, wrong at 100 TB — see
    * [[approxQuantiles]] for the sketch path. */
  def quantiles(probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty)
    // decimal-safe labels: 0.25 -> p25, 0.254 -> p25_4, 0.005 -> p0_5 —
    // rounding to an int would collide nearby probabilities into
    // duplicate column names
    val labels = probs.map { p =>
      "p" + (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
        .replace(".", "_").replace("-", "m")
    }
    require(labels.distinct.size == labels.size, s"duplicate probabilities: $probs")
    stats(probs.zip(labels).map { case (p, l) => (percentile(v, lit(p)), l) }: _*)
  }

  /** Sketch-based median — the 100 TB path beside [[exactMedian]]:
    * `approx_percentile` builds a bounded-size mergeable summary in ONE
    * pass with map-side partial aggregation (no sort, no full shuffle of
    * the values), with rank error ≤ n/`accuracy`. Results are
    * engine-specific — cross-engine parity tests must use the exact form;
    * the error-bound contract is spec'd against exact in KSeriesSpec. */
  def approxMedian(accuracy: Int = 10000): DataFrame =
    stats((approx_percentile(v, lit(0.5), lit(accuracy)), "median"))

  /** Sketch-based quantiles (see [[approxMedian]]): one row, one ARRAY
    * column `quantiles` in probability order. */
  def approxQuantiles(probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty)
    stats((approx_percentile(v, array(probs.map(lit): _*), lit(accuracy)), "quantiles"))
  }
  def countValues: DataFrame = stats((count(v), "countValues"))
  def countKeys: DataFrame = stats((count(lit(1)), "countKeys"))

  /** Structural equality with another series — same (key, value) multiset
    * (ports the reference's series equality tests, Series.fs "Series with
    * the same/different data are (not) considered equal"). Distributed:
    * (k, v, multiplicity) set-difference both ways, no collect; null
    * values compare equal to null (groupBy semantics), matching the
    * reference's missing==missing. */
  def seriesEquals(other: KSeries): Boolean = {
    val a = df.select(k.as("k"), v.as("v")).groupBy("k", "v")
      .agg(count(lit(1)).as("n_a"))
    val b = other.df.select(other.k.as("k"), other.v.as("v")).groupBy("k", "v")
      .agg(count(lit(1)).as("n_b"))
    // ONE job: null-safe full-outer join of the two grouped multisets;
    // any unmatched or count-mismatched row disproves equality (two
    // exceptAll passes would re-aggregate both inputs twice)
    a.join(b, a("k") <=> b("k") && a("v") <=> b("v"), "full_outer")
      .where(coalesce(col("n_a"), lit(-1L)) =!= coalesce(col("n_b"), lit(-2L)))
      .isEmpty
  }

  /** HyperLogLog++ distinct-value count — the sketch twin of an exact
    * `count(DISTINCT v)`, which shuffles every distinct value; the sketch
    * is a fixed few-KB register array merged map-side, the only shape that
    * counts distincts over 100 TB in one narrow pass. `rsd` is the target
    * relative standard deviation (default 5%); parity tests must use the
    * exact form — sketch estimates are engine-specific (see
    * ApproxDistinctSpec for the bounded-error guarantee). */
  def approxCountValues(rsd: Double = 0.05): DataFrame =
    stats((approx_count_distinct(v, rsd), "countDistinct"))

  /** Series.*By — group by a key projection, aggregate values
    * (reference src/SeriesModule.fs:68-98). One shuffle on the projected key
    * with map-side partial aggregation — optimal. */
  def aggBy(proj: Column => Column)(aggs: (Column, String)*): DataFrame =
    df.groupBy(proj(k).as("g"))
      .agg(aggs.head._1.as(aggs.head._2),
        aggs.tail.map { case (c, n) => c.as(n) }: _*)

  // ---- ordered analytics: shift/diff/pairwise (reference §2.6) ----
  // These accept an optional partition spec: the reference is single-machine
  // and globally ordered; at 100 TB a global order collapses a window to one
  // task, so callers partition by a natural key when one exists (see
  // graft.operators.OrderedScan for the partition-stitched global variant).

  private def orderedWindow(partitionBy: Seq[Column]) = {
    val w = if (partitionBy.isEmpty) Window.orderBy(k) else Window.partitionBy(partitionBy: _*).orderBy(k)
    w
  }

  /** Series.shift — move values by `offset` positions, keys stay
    * (reference src/SeriesModule.fs:207-219). */
  def shift(offset: Int, partitionBy: Seq[Column] = Nil): KSeries = {
    requireOrdered("shift")
    if (partitionBy.isEmpty && isLargeForGlobalWindow)
      result(graft.operators.OrderedScan.shift(df, keyCol, Seq(valueCol), offset)
        .select(col(keyCol), col(valueCol)))
    else {
      val w = orderedWindow(partitionBy)
      val shifted = if (offset >= 0) lag(v, offset).over(w) else lead(v, -offset).over(w)
      result(df.select(k.as(keyCol), shifted.as(valueCol)))
    }
  }

  /** Series.diff — x[i] - x[i-offset] (reference src/SeriesModule.fs:169-175). */
  def diff(offset: Int, partitionBy: Seq[Column] = Nil): KSeries = {
    requireOrdered("diff")
    if (partitionBy.isEmpty && isLargeForGlobalWindow) {
      val shifted = graft.operators.OrderedScan.shift(
        df.withColumn("__orig", v), keyCol, Seq(valueCol), offset)
      result(shifted.select(col(keyCol),
        (col("__orig") - col(valueCol)).as(valueCol)))
    } else {
      val w = orderedWindow(partitionBy)
      result(df.select(k.as(keyCol), (v - lag(v, offset).over(w)).as(valueCol)))
    }
  }

  /** Series.pairwise — consecutive (prev, cur); key = the later key
    * (Backward direction, reference src/Series.fs:461-500). */
  def pairwise(partitionBy: Seq[Column] = Nil): DataFrame = {
    requireOrdered("pairwise")
    if (partitionBy.isEmpty && isLargeForGlobalWindow) {
      // prev via the distributed positional shift; never a global window
      val shifted = graft.operators.OrderedScan.shift(
        df.withColumn("__cur", v), keyCol, Seq(valueCol), 1)
      shifted.select(col(keyCol), col(valueCol).as("prev"), col("__cur").as("cur"))
        .where(col("prev").isNotNull)
    } else {
      val w = orderedWindow(partitionBy)
      df.select(k.as(keyCol), lag(v, 1).over(w).as("prev"), v.as("cur"))
        .where(col("prev").isNotNull)
    }
  }

  // ---- fill (reference src/SeriesModule.fs:612-655) ----

  /** fillMissing Direction.Forward — carry last non-missing value forward
    * (reference kernel src/Vectors/ArrayVector.fs:75-101).
    * Window form; for the partition-stitched scale path see
    * graft.operators.OrderedScan.forwardFill. */
  def fillForward(partitionBy: Seq[Column] = Nil): KSeries = {
    requireOrdered("fillMissing")
    if (partitionBy.isEmpty && isLargeForGlobalWindow)
      result(graft.operators.OrderedScan.forwardFill(df, keyCol, Seq(valueCol))
        .select(col(keyCol), col(valueCol)))
    else {
      val w = orderedWindow(partitionBy).rowsBetween(Window.unboundedPreceding, 0)
      result(df.select(k.as(keyCol), last(v, ignoreNulls = true).over(w).as(valueCol)))
    }
  }

  /** fillMissing Direction.Backward. */
  def fillBackward(partitionBy: Seq[Column] = Nil): KSeries = {
    requireOrdered("fillMissing")
    if (partitionBy.isEmpty && isLargeForGlobalWindow)
      result(graft.operators.OrderedScan.backwardFill(df, keyCol, Seq(valueCol))
        .select(col(keyCol), col(valueCol)))
    else {
      val base = if (partitionBy.isEmpty) Window.orderBy(k.desc) else Window.partitionBy(partitionBy: _*).orderBy(k.desc)
      val w = base.rowsBetween(Window.unboundedPreceding, 0)
      result(df.select(k.as(keyCol), last(v, ignoreNulls = true).over(w).as(valueCol)))
    }
  }

  /** fillMissingWith constant. */
  def fillWith(value: Any): KSeries =
    result(df.select(k.as(keyCol), coalesce(v, lit(value)).as(valueCol)))

  /** Exponentially-weighted moving average, y_i = α·x_i + (1-α)·y_{i-1}
    * with y_1 = x_1 (additive — the reference has no EWM family). A
    * sequential recurrence no window frame expresses; always runs as the
    * distributed two-level stitch ([[graft.operators.OrderedScan.ewma]]) —
    * never a single-task collapse. Missing values are dropped first (the
    * reference's stats skip missings the same way). */
  def ewma(alpha: Double): KSeries = {
    requireOrdered("ewma")
    result(graft.operators.OrderedScan.ewma(df, keyCol, valueCol, alpha, valueCol))
  }

  // ---- lookup (reference src/Series.fs:156-209) ----

  /** Point lookup with Lookup semantics, skipping missing values exactly like
    * the reference (lookup skips missing: src/Indices/LinearIndex.fs:105-123). */
  def lookup(key: Column, sem: Lookup): DataFrame = sem match {
    case Lookup.Exact =>
      df.where(k === key && v.isNotNull)
    case Lookup.NearestSmaller =>
      df.where(k <= key && v.isNotNull).orderBy(k.desc).limit(1)
    case Lookup.NearestGreater =>
      df.where(k >= key && v.isNotNull).orderBy(k.asc).limit(1)
  }
}

object KSeries {
  /** Default size above which unpartitioned shift/diff/fill delegate to
    * [[graft.operators.OrderedScan]] (see isLargeForGlobalWindow). */
  val DefaultGlobalWindowMaxBytes: Long =
    graft.operators.OrderedScan.DefaultGlobalWindowMaxBytes
}
