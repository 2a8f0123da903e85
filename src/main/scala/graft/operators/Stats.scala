package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Statistical modeling over groups and ordered series, built on EXACT
  * integer sufficient statistics so results hash-match a SQL oracle
  * cross-engine (see the oracle parity conventions: integer sums are
  * order-free; one identical double expression over identical integers is
  * IEEE-deterministic).
  *
  * Reference surface: FSharp.DataFrame ships `Series.mean/sdv` and window
  * `Aggregate` (reference `src/Series.fs` statistics block) but no model
  * fitting; per-group OLS, autocorrelation and drawdown are the additive
  * analytics a data-engineering user reaches for next, expressed
  * Spark-first (one hash-aggregate pass; no iteration, no collect).
  */
object Stats {

  /** Per-group simple linear regression y = a·x + b from ONE aggregation
    * pass. `xInt`/`yInt` must be integer-valued columns (caller quantizes —
    * e.g. cents); the five sufficient sums are exact longs, combined in
    * double precision ONLY at the end (cast-then-combine, so an engine
    * whose integer sums overflow differently can never disagree).
    *
    * At 100 TB this is the textbook map-side-combinable shape: Catalyst
    * partial-aggregates the five sums per partition, the shuffle carries
    * #groups×5 longs, and no second pass exists (contrast Lloyd-style
    * iteration). Output: group, n, slope/intercept/r2 (round 6).
    */
  def olsByGroup(df: DataFrame, groupCol: String, xInt: Column, yInt: Column): DataFrame = {
    val agg = df
      .select(col(groupCol), xInt.cast("long").as("__x"), yInt.cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sx"),
        sum(col("__y")).as("sy"),
        sum(col("__x") * col("__y")).as("sxy"),
        sum(col("__x") * col("__x")).as("sxx"),
        sum(col("__y") * col("__y")).as("syy"))
    // doubles from exact longs; numerators/denominators in double to dodge
    // int64 overflow (n·sxy can exceed 2^63 long before the double loses
    // the digits that survive round-6)
    val nD = col("n").cast("double")
    val cxy = nD * col("sxy") - col("sx").cast("double") * col("sy")
    val cxx = nD * col("sxx") - col("sx").cast("double") * col("sx")
    val cyy = nD * col("syy") - col("sy").cast("double") * col("sy")
    val slope = cxy / cxx
    agg.select(
      col(groupCol),
      col("n"),
      round(slope, 6).as("slope"),
      round((col("sy").cast("double") - slope * col("sx")) / nD, 6).as("intercept"),
      round((cxy * cxy) / (cxx * cyy), 6).as("r2"))
  }

  /** Sample autocorrelation of an ordered integer series at lags 1..`maxLag`:
    * Pearson r between (s_t, s_{t-l}) over the overlapping pairs, from the
    * same exact-integer sufficient statistics as [[olsByGroup]].
    *
    * The lag alignment is a self-JOIN on the key (key, key−l), not a
    * global-window `lag()`: the join shuffles on the key and scales to an
    * arbitrarily long series, where a single unpartitioned window would
    * serialize (reference `Series.Pairwise`/`Shift` are the lag-1 special
    * case, reference `src/Series.fs`). `keyShift` maps (key, l) → the key
    * expected `l` steps EARLIER (e.g. `date_sub(k, l)` for a daily series).
    */
  def acf(
      series: DataFrame,
      keyCol: String,
      valInt: Column,
      maxLag: Int,
      keyShift: (Column, Column) => Column): DataFrame = {
    val s = series.select(col(keyCol).as("__k"), valInt.cast("long").as("__v"))
    val cur = s
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("__kprev", keyShift(col("__k"), col("lag")))
    val prev = s.select(col("__k").as("__kprev"), col("__v").as("__vprev"))
    val agg = cur.join(prev, "__kprev")
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__vprev")).as("sx"),
        sum(col("__v")).as("sy"),
        sum(col("__vprev") * col("__v")).as("sxy"),
        sum(col("__vprev") * col("__vprev")).as("sxx"),
        sum(col("__v") * col("__v")).as("syy"))
    val nD = col("n").cast("double")
    val cxy = nD * col("sxy") - col("sx").cast("double") * col("sy")
    val cxx = nD * col("sxx") - col("sx").cast("double") * col("sx")
    val cyy = nD * col("syy") - col("sy").cast("double") * col("sy")
    agg.select(col("lag"), col("n"), round(cxy / sqrt(cxx * cyy), 6).as("r"))
  }

  /** Running-max drawdown per key — the finance classic over an ordered
    * integer series: cummax(v) − v, plus the per-key summary (max drawdown,
    * peak count, final high-water mark). Ordering ties broken by
    * `tiebreak` so the prefix sets — and therefore every row's running
    * max — are deterministic cross-engine.
    *
    * Partitioned by `partCol`: each key's scan is an independent window
    * (the natural training-shard/date-partition layout at scale); for ONE
    * global series use [[OrderedScan.runningStats]]'s stitched form
    * instead of an unpartitioned window. */
  def drawdownSummary(
      df: DataFrame,
      partCol: String,
      orderCol: Column,
      tiebreak: Column,
      valInt: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol)).orderBy(col("__o"), col("__t"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(partCol), orderCol.as("__o"), tiebreak.as("__t"), valInt.cast("long").as("__v"))
      .withColumn("__hwm", max(col("__v")).over(w))
      .groupBy(col(partCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("__hwm") - col("__v")).as("max_drawdown"),
        sum(when(col("__hwm") === col("__v"), 1L).otherwise(0L)).as("n_peaks"),
        max(col("__v")).as("high_water"))
  }

  /** Two-sample Kolmogorov-Smirnov distance between the distributions of
    * an integer metric under two cohorts — the distribution-drift gate a
    * training pipeline runs when a new source lands (the KL drift of
    * `Text.sourceTokenDrift` needs binning; KS is binning-free). Output:
    * ONE row (n1, n2, d_num BIGINT, ks_ppm) where the KS statistic
    * D = d_num / (n1·n2) and ks_ppm is its fixed-point integer DIV — all
    * EXACT integer arithmetic (D's candidate suprema occur at sample
    * points, and at value v, |F1−F2|·n1·n2 = |r1·n2 − r2·n1| with r the
    * cumulative counts), so the hash can't drift cross-engine.
    *
    * Scale shape: the log collapses to one row per DISTINCT metric value
    * FIRST (map-side-combinable conditional counts; domain is
    * value-distinct-sized, like a vocabulary), then the two cumulative
    * counts ride ONE OrderedScan bucket-stitch pass over the value order —
    * no global window, no sort of the raw log. Bounds: holds through
    * n1, n2 ≤ ~3e9 each (d_num ≤ n1·n2 ≤ 9e18; ks_ppm multiplies d_num
    * by 1e6 only after the DIV by... — computed as d_num·1e6 DIV n1n2,
    * so keep n1·n2 ≤ 9.2e12, i.e. ~3e6 rows per side; above that drop
    * the ppm column or rescale d_num first). */
  def ksDrift(
      df: DataFrame,
      valueInt: Column,
      inCohort1: Column,
      inCohort2: Column): DataFrame = {
    val perValue = df
      .select(valueInt.cast("long").as("__v"),
        inCohort1.as("__a"), inCohort2.as("__b"))
      .where(col("__a") || col("__b"))
      .groupBy(col("__v"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("__c1"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__c2"))
      // value-domain-sized; checkpoint so the raw log is scanned ONCE
      // (totals + stitch both read this)
      .localCheckpoint(true)
    val cum = OrderedScan.runningSumsLong(
      perValue, "__v", Seq("__c1" -> "__r1", "__c2" -> "__r2"))
    val totals = perValue.agg(
      sum(col("__c1")).as("n1"), sum(col("__c2")).as("n2"))
    cum.crossJoin(broadcast(totals))
      .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
        max(abs(col("__r1") * col("n2") - col("__r2") * col("n1")))
          .as("d_num"))
      .select(col("n1"), col("n2"), col("d_num"),
        expr("d_num * 1000000L DIV (n1 * n2)").as("ks_ppm"))
  }

  /** Benford's-law expected first-digit frequencies as integer ppm —
    * round(log10(1 + 1/d)·1e6) precomputed as LITERALS so both engines
    * compare against identical constants (a runtime log10 would hang the
    * hash on cross-engine libm agreement). */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit audit of a positive numeric column — the
    * classic anomaly screen over financial-style magnitudes. Output per
    * digit 1-9: observed count, observed ppm (integer DIV), expected
    * Benford ppm (literal), absolute deviation ppm — all exact integers.
    *
    * ONE map-side-combinable agg on a 9-value key space (the digit is a
    * codegen substring of the floored value); the total joins back as a
    * 1-row broadcast and the expectation as a 9-row literal frame. Rows
    * with value < 1 are excluded (no leading significant digit in the
    * integer part — document the domain, don't guess). */
  def benfordDeviation(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digits = df
      .select(value.cast("double").as("__v")).where(col("__v") >= 1.0)
      .select(substring(col("__v").cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("__total"))
    val expected = benfordPpm.toDF("digit", "exp_ppm")
    digits.crossJoin(broadcast(total))
      .join(broadcast(expected), Seq("digit"))
      .select(col("digit"), col("n"),
        expr("n * 1000000L DIV __total").as("obs_ppm"),
        col("exp_ppm"),
        expr("abs(n * 1000000L DIV __total - exp_ppm)").as("dev_ppm"))
  }

  /** Two-arm A/B conversion lift: per-arm entity and converter counts,
    * fixed-point conversion rates, the signed rate difference, and the
    * two-proportion z-score. Counts and ppm rates are exact integers;
    * z is ONE double expression over those identical integers (pooled
    * p̂, round 6) — the oracle-parity recipe for the single float the
    * statistic genuinely needs.
    *
    * `inArm1`/`converted` are row-level predicates; an entity converts
    * if ANY of its rows converts (max-over-group, so the input can be
    * the raw event log — one entity-keyed agg, then a 4-long reduction
    * to the driver-free 1-row result). */
  def abLift(
      df: DataFrame,
      entityCol: String,
      inArm1: Column,
      converted: Column): DataFrame = {
    val perEntity = df
      .select(col(entityCol), inArm1.as("__a"), converted.as("__c"))
      .groupBy(col(entityCol))
      .agg(max(when(col("__a"), 1L).otherwise(0L)).as("__arm1"),
        max(when(col("__c"), 1L).otherwise(0L)).as("__conv"))
    val agg = perEntity.agg(
      sum(col("__arm1")).as("n1"),
      sum(lit(1L) - col("__arm1")).as("n2"),
      sum(col("__arm1") * col("__conv")).as("conv1"),
      sum((lit(1L) - col("__arm1")) * col("__conv")).as("conv2"))
    val p1 = col("conv1").cast("double") / col("n1").cast("double")
    val p2 = col("conv2").cast("double") / col("n2").cast("double")
    val pPool = (col("conv1") + col("conv2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    val z = (p1 - p2) / sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double")))
    agg.select(col("n1"), col("conv1"), col("n2"), col("conv2"),
      expr("conv1 * 1000000L DIV n1").as("p1_ppm"),
      expr("conv2 * 1000000L DIV n2").as("p2_ppm"),
      expr("conv1 * 1000000L DIV n1 - conv2 * 1000000L DIV n2").as("diff_ppm"),
      round(z, 6).as("z"))
  }

  /** Gini coefficient of a non-negative integer quantity over units (the
    * concentration audit: how skewed is revenue across customers, tokens
    * across sources). Exact integer end-to-end: units aggregate to long
    * totals, the ascending rank comes from the distributed
    * [[OrderedScan.rowNumber]] stitch (ties carry equal values, so any
    * tie order yields the same Σ rank·x), and the classic
    * G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx) evaluates in decimal(38,0)
    * (Σ rank·x overflows int64 ~1e18 well below 100 TB unit counts) with
    * one truncating DIV to ppm.
    *
    * Shape at scale: one unit-keyed agg, one bucket-range shuffle for the
    * rank, a 3-value reduction. Nothing data-sized is driver-side. */
  def giniConcentration(
      df: DataFrame,
      unitCol: String,
      valueInt: Column): DataFrame = {
    val unit = df.groupBy(col(unitCol))
      .agg(sum(valueInt.cast("long")).as("__v"))
    val ranked = graft.operators.OrderedScan.rowNumber(unit, "__v", "__rk")
    ranked
      .agg(
        count(lit(1)).as("n"),
        sum(col("__v")).as("total"),
        sum((col("__rk") + 1).cast("decimal(38,0)") * col("__v")).as("__ws"))
      .select(col("n"), col("total"),
        expr("""CAST((2 * __ws - (CAST(n AS DECIMAL(38,0)) + 1) * total)
                 * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * total) AS BIGINT)""")
          .as("gini_ppm"))
  }

  /** CUSUM change-point detection over a keyed integer series (daily
    * event counts): the offset k maximizing |n·prefix_k − rank_k·total| —
    * the cumulative-sum statistic cross-multiplied by n so the running
    * deviation from the global mean stays exact integer (no mean
    * division). Ties take the EARLIEST key. Output: series length, total,
    * the change-point key, and the max statistic.
    *
    * The series is an AGGREGATE domain (calendar-bounded — days, not
    * rows), so the prefix windows ride a global window over ≤ a few
    * thousand aggregated rows at any corpus size; the raw log collapses
    * in one map-side-combinable agg. */
  def cusumChangePoint(
      df: DataFrame,
      key: Column,
      xInt: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val series = df.select(key.as("k"), xInt.cast("long").as("__x"))
      .groupBy(col("k")).agg(sum(col("__x")).as("__x"))
    val totals = series.agg(
      count(lit(1)).as("n"), sum(col("__x")).as("total"))
    val w = Window.orderBy(col("k"))
    val cum = series
      .withColumn("__pre", sum(col("__x"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .crossJoin(broadcast(totals))
      .select(col("k"), col("n"), col("total"),
        abs(col("n") * col("__pre") - col("__rk") * col("total")).as("__s"))
      // key-domain-sized (days, not rows); materialize once — the max and
      // the argmax filter both read it, and without this the whole
      // series pipeline (scan + agg + window) re-executes per branch
      .localCheckpoint(true)
    val mx = cum.agg(max(col("__s")).as("max_stat"))
    cum.crossJoin(broadcast(mx))
      .where(col("__s") === col("max_stat"))
      .groupBy(col("n"), col("total"), col("max_stat"))
      .agg(min(col("k")).as("change_at"))
      .select(col("n"), col("total"), col("change_at"), col("max_stat"))
  }

  /** Robust per-group outlier census via median absolute deviation: per
    * group, the exact interpolated median (×2 — midpoints of integers are
    * halves, so doubling keeps every value integer), the MAD (×4, same
    * trick applied twice), and the count of rows with |x − med| > k·MAD
    * (compared as 2·dev2 > k·mad4, all integer). The z-score screen's
    * heavy-tail-safe sibling; `valueInt` must be integer-quantized by the
    * caller (e.g. micro-units).
    *
    * Three group-keyed passes (median → deviations → MAD + census) — the
    * holistic median genuinely needs its input materialized per group,
    * and each pass is group-parallel with model-sized join sides. */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueInt: Column,
      k: Int = 3): DataFrame = {
    val base = df.select(col(groupCol), valueInt.cast("long").as("__x"))
    val med = base.groupBy(col(groupCol))
      .agg(expr("CAST(2 * percentile(__x, 0.5) AS BIGINT)").as("med_x2"))
    val dev = base.join(med, Seq(groupCol))
      .withColumn("__d2", abs(lit(2L) * col("__x") - col("med_x2")))
    val mad = dev.groupBy(col(groupCol), col("med_x2"))
      .agg(expr("CAST(2 * percentile(__d2, 0.5) AS BIGINT)").as("mad_x4"))
    dev.join(mad.drop("med_x2"), Seq(groupCol))
      .groupBy(col(groupCol), col("med_x2"), col("mad_x4"))
      .agg(count(lit(1)).as("n"),
        sum(when(lit(2L) * col("__d2") > lit(k.toLong) * col("mad_x4"), 1L)
          .otherwise(0L)).as("outliers"))
      .select(col(groupCol), col("n"), col("med_x2"), col("mad_x4"),
        col("outliers"))
  }

  /** Rolling Pearson correlation between two integer series per group
    * over a trailing `win`-row window of the (group, key)-aggregated
    * series: windowed exact-integer sufficient sums (n, Σx, Σy, Σxy, Σx²,
    * Σy²), then ONE double correlation expression (round 6) — zero
    * variance in either window yields NULL on both engines (decided by an
    * exact integer comparison, never by float == 0). The co-movement
    * panel: does volume track value day-to-day?
    *
    * The raw log collapses in one map-side-combinable (group, key) agg;
    * the rolling frame is a group-partitioned window over that aggregate
    * (key-parallel; rows per group calendar-bounded). */
  def rollingCorr(
      df: DataFrame,
      groupCol: String,
      key: Column,
      xInt: Column,
      yInt: Column,
      win: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .select(col(groupCol), key.as("k"), xInt.cast("long").as("__x"),
        yInt.cast("long").as("__y"))
      .groupBy(col(groupCol), col("k"))
      .agg(sum(col("__x")).as("__x"), sum(col("__y")).as("__y"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("k"))
      .rowsBetween(-(win - 1), 0)
    val sums = daily
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("sx", sum(col("__x")).over(w))
      .withColumn("sy", sum(col("__y")).over(w))
      .withColumn("sxy", sum(col("__x") * col("__y")).over(w))
      .withColumn("sxx", sum(col("__x") * col("__x")).over(w))
      .withColumn("syy", sum(col("__y") * col("__y")).over(w))
    val vx = col("nw") * col("sxx") - col("sx") * col("sx")
    val vy = col("nw") * col("syy") - col("sy") * col("sy")
    val corr = (col("nw") * col("sxy") - col("sx") * col("sy")).cast("double") /
      sqrt(vx.cast("double") * vy.cast("double"))
    sums.select(col(groupCol), col("k"), col("nw"),
      when(vx === 0L || vy === 0L, lit(null).cast("double"))
        .otherwise(round(corr, 6)).as("corr"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns (source × language: "is the language mix uniform across
    * sources?"), plus Cramér's V effect size. The statistic is kept
    * EXACT-integer by clearing denominators per cell:
    * χ² = Σ (O·N − R·C)² / (N·R·C); each cell's term is computed in
    * decimal128 and floor-DIV'd to ppm, so the reported `chi2_ppm` is a
    * deterministic integer cross-engine (sum of per-cell floors — the
    * same fixed-point convention as [[giniConcentration]]). Cramér's V is
    * ONE double expression over those integers (round 6), the
    * [[abLift]] z-score convention.
    *
    * Plan: ONE map-side-combinable count agg builds the contingency cells
    * (checkpointed — the margins and the join both read it); row/column
    * margins are cell-table aggregates broadcast back. Everything after
    * the first shuffle runs on |rows|×|cols| rows, independent of corpus
    * size. Counts must satisfy O·N < ~1e19 so (O·N−R·C)²·1e6 fits
    * decimal(38,0) — true for any per-category count below ~3 billion. */
  def chiSquareIndependence(df: DataFrame, rowCat: Column, colCat: Column): DataFrame = {
    val cells = df.select(rowCat.as("__r"), colCat.as("__c"))
      .groupBy(col("__r"), col("__c")).agg(count(lit(1)).as("__o"))
      .localCheckpoint(true)
    val rm = cells.groupBy(col("__r")).agg(sum(col("__o")).as("__rt"))
    val cm = cells.groupBy(col("__c")).agg(sum(col("__o")).as("__ct"))
    val tot = cells.agg(sum(col("__o")).as("__n"),
      count_distinct(col("__r")).as("__nr"),
      count_distinct(col("__c")).as("__nc"))
    val term = expr(
      """CAST((CAST(__o AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
        |     * (CAST(__o AS DECIMAL(38,0)) * __n - CAST(__rt AS DECIMAL(38,0)) * __ct)
        |     * 1000000
        |     DIV (CAST(__n AS DECIMAL(38,0)) * __rt * __ct) AS DECIMAL(38,0))
        |""".stripMargin)
    // ZERO cells matter: a (row, col) pair with no observations still
    // contributes R·C/N to χ² but has no row in `cells` — the margins
    // cross-product restores the full r×c grid (margin tables are tiny)
    val a = rm.crossJoin(cm)
      .join(cells, Seq("__r", "__c"), "left_outer")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n"), max(col("__nr")).as("n_rows"),
        max(col("__nc")).as("n_cols"), sum(term).as("__x2"))
    a.select(col("n"), col("n_rows"), col("n_cols"),
      ((col("n_rows") - 1L) * (col("n_cols") - 1L)).as("dof"),
      col("__x2").cast("long").as("chi2_ppm"),
      round(sqrt((col("__x2").cast("double") / 1e6) /
        (col("n") * least(col("n_rows") - 1L, col("n_cols") - 1L)).cast("double")),
        6).as("cramers_v"))
  }

  /** ROC AUC of an integer score separating a binary class, via the exact
    * Mann-Whitney U statistic with midrank tie handling — the standard
    * rank-sum identity AUC = U / (n⁺·n⁻). No per-row ranks exist anywhere:
    * the score collapses to its VALUE DOMAIN (one map-side-combinable
    * agg), the exclusive cumulative count rides the distributed
    * [[OrderedScan.runningSumsLong]] stitch over that domain, and each
    * value's positives contribute pos·(2·below + cnt + 1) — twice the
    * midrank sum, so ties stay integer. `u2` = 2·U exactly;
    * `auc_ppm` = U·10⁶ ÷ (n⁺·n⁻) floor-divided in decimal128.
    *
    * At 100 TB: the domain agg is the only corpus-sized shuffle; the
    * stitch runs over distinct score values (bounded by quantization, not
    * rows). NULL scores are excluded; a single-class input yields NULL. */
  def aucMannWhitney(df: DataFrame, scoreInt: Column, positive: Column): DataFrame = {
    val base = df.select(scoreInt.cast("long").as("__s"),
      positive.cast("int").cast("long").as("__p"))
      .where(col("__s").isNotNull && col("__p").isNotNull)
    val dom = base.groupBy(col("__s"))
      .agg(count(lit(1)).as("__cnt"), sum(col("__p")).as("__pos"))
    val run = graft.operators.OrderedScan.runningSumsLong(
      dom, "__s", Seq(("__cnt", "__cum")))
    val below = col("__cum") - col("__cnt")
    val a = run.agg(
      sum(col("__cnt")).as("n"), sum(col("__pos")).as("n_pos"),
      sum((col("__pos") * (lit(2L) * below + col("__cnt") + lit(1L)))
        .cast("decimal(38,0)")).as("__s2"))
    a.select(col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        (col("__s2") - col("n_pos").cast("decimal(38,0)") * (col("n_pos") + 1L))
          .cast("decimal(38,0)").as("__u2"))
      .select(col("n"), col("n_pos"), col("n_neg"),
        col("__u2").cast("long").as("u2"),
        when(col("n_pos") === 0L || col("n_neg") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            """CAST(__u2 * 1000000
              | DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)""".stripMargin))
          .as("auc_ppm"))
  }

  /** Spearman rank correlation between two integer columns — Pearson on
    * exact ×2 midranks. Each column's midranks come from its VALUE DOMAIN
    * (distinct values + counts, one agg per side) with the exclusive
    * cumulative count stitched by [[OrderedScan.runningSumsLong]]:
    * midrank×2 = 2·below + cnt + 1, an integer even under ties. Rows then
    * pick up their midranks through two value-keyed equi-joins, the five
    * sufficient sums accumulate in decimal128 (rank ~ corpus size, so
    * rank² sums pass int64 at ~1e9 rows), and ρ is ONE rounded double.
    * Zero variance (a constant column) → NULL, integer-exact guard.
    *
    * Contrast [[rollingCorr]] (Pearson on raw values): Spearman is the
    * drift-robust monotone-association panel — outlier-immune, scale-free. */
  def spearmanCorr(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("long").as("__x"), y.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
    def midranks(vcol: String, out: String): DataFrame = {
      val dom = base.groupBy(col(vcol)).agg(count(lit(1)).as("__cnt"))
      graft.operators.OrderedScan.runningSumsLong(dom, vcol, Seq(("__cnt", "__cum")))
        .select(col(vcol),
          (lit(2L) * (col("__cum") - col("__cnt")) + col("__cnt") + lit(1L)).as(out))
    }
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val j = base.join(midranks("__x", "__mrx"), "__x")
      .join(midranks("__y", "__mry"), "__y")
    val a = j.agg(count(lit(1)).as("n"),
      sum(dec(col("__mrx"))).as("sx"), sum(dec(col("__mry"))).as("sy"),
      sum(dec(col("__mrx")) * col("__mry")).as("sxy"),
      sum(dec(col("__mrx")) * col("__mrx")).as("sxx"),
      sum(dec(col("__mry")) * col("__mry")).as("syy"))
    val n = dec(col("n"))
    val vx = n * col("sxx") - col("sx") * col("sx")
    val vy = n * col("syy") - col("sy") * col("sy")
    a.select(col("n"),
      when(vx === dec(lit(0)) || vy === dec(lit(0)), lit(null).cast("double"))
        .otherwise(round((n * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(vx.cast("double") * vy.cast("double")), 6)).as("rho"))
  }

  /** k-anonymity audit over a set of quasi-identifier columns: group sizes
    * of the QI projection, the minimum group size (the dataset's k), and
    * the census of groups/rows below the required `k` — the re-identification
    * exposure a privacy review reports before release. ONE
    * map-side-combinable count agg (the QI cardinality bounds everything
    * after); output is a single audit row. Complements [[Text.scrubPii]]
    * (content-level) and `Text.redactRareTokens` (vocabulary-level): this
    * is the RECORD-level privacy gate. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    val groups = df.groupBy(quasiIds: _*).agg(count(lit(1)).as("__sz"))
    groups.agg(
      sum(col("__sz")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("__sz")).as("k_min"),
      sum(when(col("__sz") < k, lit(1L)).otherwise(lit(0L))).as("groups_below_k"),
      sum(when(col("__sz") < k, col("__sz")).otherwise(lit(0L))).as("rows_below_k"))
  }

  /** Per-group WEIGHTED MEDIAN of an integer value with integer weights —
    * the robust center under importance weighting (sampling weights, token
    * counts): the smallest v whose cumulative weight reaches half the
    * total, decided as `2·cum ≥ total` so halves stay exact-integer.
    *
    * The corpus collapses to the per-group VALUE DOMAIN first (one
    * map-side-combinable agg); the cumulative rides a group-partitioned
    * window over that domain (key-parallel — each group's distinct values
    * are its own partition, no global stitch needed); totals join back
    * group-keyed. Output: (g, w_median, w_total). */
  def weightedMedian(df: DataFrame, groupCol: Column, valueCol: Column,
      weightCol: Column): DataFrame = {
    val dom = df.select(groupCol.as("g"), valueCol.cast("long").as("__v"),
        weightCol.cast("long").as("__w"))
      .where(col("__v").isNotNull && col("__w").isNotNull && col("__w") > 0)
      .groupBy(col("g"), col("__v")).agg(sum(col("__w")).as("__w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("__v"))
    val cum = dom.withColumn("__cum", sum(col("__w")).over(win))
    val tot = dom.groupBy(col("g")).agg(sum(col("__w")).as("w_total"))
    cum.join(tot, Seq("g"))
      .where(col("__cum") * 2 >= col("w_total"))
      .groupBy(col("g"), col("w_total"))
      .agg(min(col("__v")).as("w_median"))
      .select(col("g"), col("w_median"), col("w_total"))
  }

  /** Per-group EQUI-DEPTH histogram (4 buckets) — the quantile-bucketed
    * histogram a cost-based optimizer persists (equal-width q178's
    * complement: constant POPULATION per bucket, not constant width).
    * Bucket edges are the exact ×4 quarter-quantiles (binary-exact
    * interpolation, the q212 convention), bucket membership is integer
    * comparison v×4 vs edge (upper-inclusive), so the whole census is
    * engine-exact. One holistic quantile agg per group + one pass over
    * the VALUE DOMAIN (not raw rows) for the counts.
    * Output: (g, bucket 1..4, n_rows) sorted. */
  def equiDepthHistogram(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"), valueCol.cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val dom = base.groupBy(col("g"), col("__v")).agg(count(lit(1)).as("__cnt"))
    val edges = base.groupBy(col("g")).agg(
      percentile(col("__v") * 4, lit(0.25)).cast("long").as("__e1"),
      percentile(col("__v") * 4, lit(0.50)).cast("long").as("__e2"),
      percentile(col("__v") * 4, lit(0.75)).cast("long").as("__e3"))
    dom.join(edges, Seq("g"))
      .withColumn("bucket", lit(1L) +
        (col("__v") * 4 > col("__e1")).cast("long") +
        (col("__v") * 4 > col("__e2")).cast("long") +
        (col("__v") * 4 > col("__e3")).cast("long"))
      .groupBy(col("g"), col("bucket")).agg(sum(col("__cnt")).as("n_rows"))
      .orderBy(col("g"), col("bucket"))
  }

  /** One-pass pairwise COVARIANCE MATRIX over k integer columns — the
    * feature-stats block a CBO or feature store persists: all k(k+1)/2
    * covariances from ONE map-side-combinable aggregate of sufficient
    * sums (n, Σxᵢ, Σxᵢxⱼ), never k² passes. Covariance is kept
    * exact-integer: cov_q = (n·Σxy − Σx·Σy) DIV n² in decimal128 —
    * population covariance, truncating div (cross-engine exact).
    * Output: (col_i, col_j, n, cov_q) for i ≤ j, sorted. */
  def covarianceMatrix(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val base = df.select(cols.map { case (n, c) => c.cast("long").as(n) }: _*)
      .na.drop()
    val names = cols.map(_._1)
    // Two-level sums: LONG partials over 4096-row chunks, widened to
    // decimal(38,0) only in the (tiny) merge — decimal accumulation on every
    // row costs ~4x long arithmetic for zero extra exactness here. Chunk ids
    // come from monotonically_increasing_id DIV 4096 (partition id lives in
    // the upper bits, so chunks never span partitions and the first groupBy
    // map-side-combines to ~1 row per 4096 inputs before its shuffle).
    // Safe range: |value| < 2^24 keeps any 4096-row Σxᵢxⱼ under 2^60 — the
    // same single-product-fits-long contract the one-level form had, minus
    // 12 bits of chunk headroom.
    val chunked = base.withColumn("__chunk", shiftright(monotonically_increasing_id(), 12))
    // magnitude guard WITHOUT abs: abs(Long.MinValue) is still negative,
    // so an abs-based max would let Long.MinValue sail past the 2^24 check
    // while the chunk partials wrap. Track signed max and min instead and
    // bound both ends — no abs, no overflow, same one-pass cost.
    val partialSums =
      count(lit(1)).as("__n") +:
      max(greatest(names.map(n => col(n)): _*)).as("__mx") +:
      min(least(names.map(n => col(n)): _*)).as("__mn") +:
      (names.map(n => sum(col(n)).as(s"__s_$n")) ++
        (for { i <- names.indices; j <- i until names.size } yield
          sum(col(names(i)) * col(names(j))).as(s"__p_${names(i)}_${names(j)}")))
    val partial = chunked.groupBy(col("__chunk")).agg(partialSums.head, partialSums.tail: _*)
    val mergeSums =
      sum(col("__n")).as("__n") +:
      max(col("__mx")).as("__mx") +:
      min(col("__mn")).as("__mn") +:
      (names.map(n => sum(col(s"__s_$n").cast("decimal(38,0)")).as(s"__s_$n")) ++
        (for { i <- names.indices; j <- i until names.size } yield
          sum(col(s"__p_${names(i)}_${names(j)}").cast("decimal(38,0)"))
            .as(s"__p_${names(i)}_${names(j)}")))
    val agg = partial.agg(mergeSums.head, mergeSums.tail: _*)
    // the long chunk partials are only exact while every 4096-row Σxᵢxⱼ
    // fits a long — |value| < 2^24 guarantees it; a wider input would WRAP
    // silently, so the same one-pass row that carries the sums carries the
    // max |value| and fails loudly instead (the vocabCoverage pad-guard
    // pattern; widen the partials back to decimal if this ever trips)
    val pairs = for { i <- names.indices; j <- i until names.size } yield
      struct(lit(names(i)).as("col_i"), lit(names(j)).as("col_j"),
        // coalesce first: ZERO surviving rows (empty frame / all-null
        // column) leaves the merge agg with __n = __mx = NULL, which must
        // report n = 0 (the pre-guard behavior), not a phantom overflow
        when(coalesce(col("__mx"), lit(0L)) < (1L << 24) &&
             coalesce(col("__mn"), lit(0L)) > -(1L << 24),
            coalesce(col("__n"), lit(0L)))
          .otherwise(raise_error(lit(
            "covarianceMatrix: |value| >= 2^24 overflows the long chunk partials")))
          .as("n"),
        expr(s"""CAST((CAST(__n AS DECIMAL(38,0)) * __p_${names(i)}_${names(j)}
                |      - __s_${names(i)} * __s_${names(j)})
                |     DIV (CAST(__n AS DECIMAL(38,0)) * __n) AS BIGINT)""".stripMargin)
          .as("cov_q"))
    agg.select(explode(array(pairs: _*)).as("__e"))
      .select(col("__e.col_i"), col("__e.col_j"), col("__e.n"), col("__e.cov_q"))
      .orderBy(col("col_i"), col("col_j"))
  }

  /** Per-group mean GLOBAL percent rank — the calibration panel behind
    * "is source X length-biased": every row's percent_rank against the
    * WHOLE corpus (min-rank tie convention, `below·10⁶ DIV (n−1)` — the
    * SQL `percent_rank()` value, floored to ppm so it stays
    * exact-integer), averaged per group with a truncating div. A group
    * sampling uniformly scores ~500000; above = long-biased.
    *
    * No per-row window anywhere: ranks come from the global VALUE DOMAIN
    * (one agg + the [[OrderedScan.runningSumsLong]] stitch over distinct
    * values), rows pick them up through a (group, value)-domain join.
    * Output: (g, n_docs, mean_pr_ppm) sorted. */
  def percentRankCalibration(df: DataFrame, groupCol: Column,
      valueCol: Column): DataFrame = {
    val base = df.select(groupCol.as("g"), valueCol.cast("long").as("__v"))
      .where(col("__v").isNotNull)
    val gdom = base.groupBy(col("__v")).agg(count(lit(1)).as("__cnt"))
    val run = graft.operators.OrderedScan.runningSumsLong(
      gdom, "__v", Seq(("__cnt", "__cum")))
    val nRow = run.agg(sum(col("__cnt")).as("__n"))
    val pr = run.crossJoin(broadcast(nRow))
      .select(col("__v"),
        expr("((__cum - __cnt) * 1000000L) div (__n - 1)").as("__pr"))
    val sdom = base.groupBy(col("g"), col("__v")).agg(count(lit(1)).as("__sc"))
    sdom.join(pr, Seq("__v"))
      .groupBy(col("g"))
      .agg(sum(col("__sc")).as("n_docs"),
        expr("sum(__sc * __pr) div sum(__sc)").as("mean_pr_ppm"))
      .orderBy(col("g"))
  }
}
