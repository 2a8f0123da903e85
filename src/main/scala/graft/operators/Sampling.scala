package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and dataset mixing — training-data
  * pipeline operators (additive; the reference has no sampling surface).
  *
  * The sampler is HASH-BASED, not RNG-based: a row is kept iff the first
  * two hex chars of `md5(id)` fall below the fraction's threshold. That
  * makes the sample (a) identical on every engine and cluster layout — no
  * seed plumbing, no partition-order sensitivity (Spark's `sample()` is
  * neither repeatable across repartitionings nor reproducible in another
  * engine), (b) a pure narrow filter the optimizer pushes into the scan,
  * and (c) stable under incremental reruns: a document's membership never
  * changes as the corpus around it grows — exactly what repeated training
  * runs over a growing crawl need. Granularity is 1/256 of the keyspace. */
object Sampling {

  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction outside [0,1]")
    val n = math.round(fraction * 256).toInt
    // 256 would format as "100", which sorts BELOW 2-char hex ("ff" > "100"
    // lexicographically) and would keep ~1/16 instead of all — clamp to a
    // string above every hex pair
    if (n >= 256) "zz" else f"$n%02x"
  }

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def deterministic(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(keyOf(col(idCol)) < lit(hexThreshold(fraction)))

  private def keyOf(id: Column): Column = substring(md5(id.cast("string")), 1, 2)

  /** Per-stratum fractions (dataset mixing): `fractions` maps stratum value
    * → keep-fraction; strata not in the map use `default`. One narrow
    * filter — no shuffle, no per-stratum scans. */
  def stratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      default: Double = 0.0): DataFrame = {
    val thresh = fractions.foldLeft(lit(hexThreshold(default)): Column) {
      case (acc, (value, f)) =>
        when(col(strataCol) === value, lit(hexThreshold(f))).otherwise(acc)
    }
    df.where(keyOf(col(idCol)) < thresh)
  }

  /** Temperature-based source mixing — the resampling rule of multilingual /
    * multi-source pretraining: a stratum holding share q_s of the corpus is
    * sampled with probability p_s ∝ q_s^(1/T), flattening the source
    * distribution as T grows (T=1 → proportional, T→∞ → uniform across
    * strata). Keep-fractions are scaled so the expected output size is
    * `targetFraction` of the corpus (capped at 1 per stratum). Strata
    * weights come from ONE aggregate collect of #strata rows (model-sized,
    * like a broadcast-join build) — the sample itself stays a narrow
    * [[stratified]] filter. */
  def temperatureMix(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      temperature: Double,
      targetFraction: Double): DataFrame = {
    require(temperature > 0, s"temperature $temperature must be positive")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).toMap
    val total = counts.values.sum.toDouble
    val weights = counts.map { case (k, n) =>
      k -> math.pow(n / total, 1.0 / temperature)
    }
    val z = weights.values.sum
    val fracs = counts.map { case (k, n) =>
      k -> math.min(1.0, targetFraction * total * (weights(k) / z) / n)
    }
    stratified(df, idCol, strataCol, fracs, default = 0.0)
  }

  /** Weighted sampling without replacement (Efraimidis-Spirakis A-ES,
    * "Weighted random sampling with a reservoir", IPL 2006): each row gets
    * priority u^(1/w) with u uniform in (0,1]; the k highest priorities
    * form an exact weight-proportional sample. u is NOT random here — it
    * derives from the first 8 hex digits of md5(id) (u = (h+1)/2^32, the
    * +1 excludes u=0 where 0^(1/w) would tie every zero-weight row), so
    * the sample is reproducible on any engine/cluster and stable under
    * corpus growth, like [[deterministic]]. Rows with weight <= 0 are
    * excluded (the estimator is undefined there). One projection + a
    * top-k — no shuffle beyond the global top-k's single reduce. */
  def weightedPriority(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k $k must be positive")
    // conv(hex, 16, 10) == the positional digit sum an oracle computes
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    val u = (h + lit(1)).cast("double") / lit(4294967296.0) // 2^32
    df.where(col(weightCol) > 0)
      .withColumn("__prio", pow(u, lit(1.0) / col(weightCol)))
      .orderBy(col("__prio").desc, col(idCol).asc)
      .limit(k)
      .drop("__prio")
  }

  /** EPOCH-SALTED deterministic sampling — the multi-epoch mixing plan:
    * epoch `e` keeps a row iff the first two hex chars of
    * `md5(id || ':' || e)` clear the fraction threshold, so each epoch
    * draws an INDEPENDENT (but fully deterministic and engine-portable)
    * subsample: repeated epochs see different data, reruns and other
    * engines see the same data, and membership stays stable as the corpus
    * grows (same contract as [[deterministic]]). Pure narrow filter —
    * pushdown-friendly, no state between epochs. */
  def epochSample(df: DataFrame, idCol: String, epoch: Int, fraction: Double): DataFrame =
    df.where(
      substring(md5(concat(col(idCol).cast("string"), lit(":"), lit(epoch.toString))), 1, 2)
        < lit(hexThreshold(fraction)))

  /** LEAKAGE-SAFE train/eval split — the guard a plain per-document split
    * misses: when two NEAR-DUPLICATE documents land on opposite sides, the
    * eval set has leaked into training and the benchmark is contaminated
    * by construction. Every document inherits its similarity-COMPONENT's
    * representative (min id over the near-dup graph via
    * [[Dedup.components]]; documents in no pair represent themselves) and
    * the md5-keyspace coin is tossed on that representative — an entire
    * component always lands on ONE side, whichever similarity signal
    * (text minhash, SimHash, embedding) produced `pairs`.
    *
    * Scale shape: the components ladder (O(log diameter) key-parallel
    * rounds over the PAIR graph — tiny next to the corpus) plus one
    * left-outer equi-join of the corpus against the component table; the
    * split itself is a narrow projection. Membership is engine-portable
    * and stable under corpus growth (same md5 contract as
    * [[deterministic]]) — adding documents never flips an existing
    * document's side unless new pairs join it to a smaller-id component.
    * Output: `df` + (`rep_id`, `split` ∈ train|eval). */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      evalFraction: Double): DataFrame = {
    require(Seq("rep_id", "split", "cluster").forall(!df.columns.contains(_)),
      "rep_id/split/cluster are reserved by leakageSafeSplit")
    val comp = Dedup.components(pairs)
      .select(col("id").as(idCol), col("cluster"))
    df.join(comp, Seq(idCol), "left_outer")
      .withColumn("rep_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
      .withColumn("split",
        when(keyOf(col("rep_id")) < lit(hexThreshold(evalFraction)), lit("eval"))
          .otherwise(lit("train")))
  }

  /** WATER-FILLING budget allocation — the dataset-mixing planner: given
    * per-source amounts (token counts) and a total budget of
    * `num/den × Σamount`, allocate `min(amount, L)` to every source where
    * the water level L is the largest value the budget funds; sources
    * below the level keep everything (a small source is never upsampled),
    * the rest are capped equally — the max-min-fair cut that stops a
    * mega-crawl from drowning the mix. All arithmetic is INTEGER (level =
    * div, remainder spread one unit at a time in ascending (amount, key)
    * order), so the plan is engine-exact, and `Σalloc = budget` exactly.
    *
    * Scale shape: the closed form needs each source's rank and prefix sum
    * in ascending-amount order — [[OrderedScan.rowNumberAndSum]] over a
    * fixed-width lexicographic encoding (a 10^7-domain registry never
    * single-tasks a global window); the budget, the last fully-funded
    * rank K and its prefix P_K are three 1-row broadcasts. A source is
    * fully funded iff prefix + (n−rank)×amount ≤ budget (prefix-closed
    * because amounts ascend, so max(rank) is THE cut). */
  def waterFillBudget(
      counts: DataFrame,
      keyCol: String,
      amtCol: String,
      budgetNum: Long,
      budgetDen: Long,
      buckets: Int = 64): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0,
      s"budget fraction $budgetNum/$budgetDen must be a non-negative ratio")
    val base = 1000000000000L // 10^12 — same lexicographic pad guard as vocabCoverage
    val enc = counts
      .withColumn("__ok",
        when(col(amtCol).cast("long").between(0, base - 1),
          concat(lpad(col(amtCol).cast("long").cast("string"), 13, "0"),
            lit(":"), col(keyCol).cast("string")))
          .otherwise(raise_error(
            lit("waterFillBudget: amount outside [0, 10^12) breaks the key pad"))))
      .localCheckpoint(true) // ranked scan and the global agg share one plan
    val ranked = graft.operators.OrderedScan
      .rowNumberAndSum(enc, "__ok", "__pos0", amtCol, "__cum", buckets)
      .withColumn("__cum", col("__cum").cast("long")) // integral-valued sums
      .withColumn("__pos", col("__pos0") + 1)
    // the stitch's prefix sums ride a double accumulator and __tot×num must
    // not wrap a long — totals past 2^53 (or num×tot past 2^63) would lose
    // integer exactness SILENTLY, so fail loudly (same philosophy as the
    // per-amount pad guard; pre-scale amounts to coarser units instead)
    val totLimit = math.min(1L << 53, Long.MaxValue / math.max(budgetNum, 1L))
    val g = enc.agg(count(lit(1)).as("__n"), sum(col(amtCol)).cast("long").as("__tot"))
      .withColumn("__B",
        when(coalesce(col("__tot"), lit(0L)) < lit(totLimit),
          expr(s"(__tot * $budgetNum) DIV $budgetDen"))
          .otherwise(raise_error(lit(
            s"waterFillBudget: total amount exceeds $totLimit — allocate in coarser units"))))
    // feeds BOTH the 1-row kAgg broadcast and the output projection — without
    // this the whole ranked stitch (bucket shuffle + sort + carry) runs twice
    val withG = ranked.crossJoin(broadcast(g))
      .withColumn("__fully",
        col("__cum") + (col("__n") - col("__pos")) * col(amtCol).cast("long") <= col("__B"))
      .localCheckpoint(true)
    val kAgg = withG.agg(
      coalesce(max(when(col("__fully"), col("__pos"))), lit(0L)).as("__K"),
      coalesce(max(when(col("__fully"), col("__cum"))), lit(0L)).as("__PK"))
    withG.crossJoin(broadcast(kAgg))
      .withColumn("alloc",
        when(col("__pos") <= col("__K"), col(amtCol).cast("long"))
          .otherwise(expr("(__B - __PK) DIV (__n - __K)") +
            when(col("__pos") - col("__K") <= expr("(__B - __PK) % (__n - __K)"), lit(1L))
              .otherwise(lit(0L))))
      .select(col(keyCol), col(amtCol), col("alloc"))
  }

  /** Cap each group's contribution at `cap` rows — the per-domain cap of
    * crawl curation (no single source may dominate the training mix).
    * Deterministic: rows rank within their group by `orderCols` (make the
    * last one a unique tiebreak). ONE window partitioned by the group key —
    * parallel across groups, no global sort; at 100 TB this is the same
    * shape as any per-user sessionization. A skewed mega-group serializes
    * only its own partition (cap >> skew threshold ⇒ consider pre-slicing
    * by a salt + second-level re-rank; not needed at cap ~10^2). */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[Column],
      cap: Int): DataFrame = {
    require(cap > 0, s"cap $cap must be positive")
    require(!df.columns.contains("__rn"), "__rn is reserved by capPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Deterministic global shuffle + balanced shard assignment — the
    * training-shard writer shape: order the corpus by `md5(id)` (an
    * engine-portable, content-independent permutation, so adjacent source
    * documents land in different shards) and split that order into
    * `nShards` contiguous, size-balanced ranges (shard sizes differ by at
    * most 1). Position comes from [[OrderedScan.rowNumber]] — the
    * distributed two-level stitch, never a global single-task window —
    * and the total count joins as a 1-row broadcast. Downstream,
    * `df.write.partitionBy("shard")` materializes the shards; epoch
    * re-shuffles are just a different salt concatenated into the hash.
    * Output: original columns + (__k md5 key, pos 0-based, shard). */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      buckets: Int = 64): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    require(!df.columns.contains("__k"), "__k is reserved by shardAssign")
    val keyed = df.withColumn("__k", md5(col(idCol).cast("string")))
    val pos = OrderedScan.rowNumber(keyed, "__k", "pos", buckets)
    val total = keyed.agg(count(lit(1)).as("__n"))
    pos.crossJoin(broadcast(total))
      // (pos * nShards) DIV total: exact integer split — shard boundaries
      // land where the fraction pos/total crosses i/nShards, so sizes are
      // floor/ceil(total/nShards) with no accumulation error
      .withColumn("shard", expr(s"(pos * $nShards) DIV __n"))
      .drop("__n")
  }

  /** Keep rows whose `valueCol` lies within their OWN group's exact
    * [lo, hi] quantiles — per-source outlier trimming (too-short / too-long
    * documents are low-quality with high probability). Two passes: a
    * group-keyed hash agg computes exact interpolated percentiles (output
    * is #groups rows — model-sized), broadcast-joined back as a narrow
    * filter. No global sort, no per-group scans. */
  def filterByGroupQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double,
      hi: Double): DataFrame = {
    require(0 <= lo && lo <= hi && hi <= 1, s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val q = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(lo)).as("__qlo"),
      percentile(col(valueCol), lit(hi)).as("__qhi"))
    df.join(broadcast(q), groupCol)
      .where(col(valueCol) >= col("__qlo") && col(valueCol) <= col("__qhi"))
      .drop("__qlo", "__qhi")
  }

  /** WINSORIZE `valueCol` to its own group's exact [lo, hi] quantiles —
    * the clamp-variant of [[filterByGroupQuantiles]]: outliers are pulled
    * to the boundary instead of dropped (row count preserved — the choice
    * when downstream weighting/packing must see every document). Same
    * scale shape: one group-keyed exact-percentile agg (#groups rows,
    * broadcast back), then a narrow least/greatest projection. Adds
    * `outCol` (double — quantile boundaries interpolate); the original
    * column is untouched. */
  def winsorizeByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lo: Double,
      hi: Double,
      outCol: String): DataFrame = {
    require(0 <= lo && lo <= hi && hi <= 1, s"need 0 <= lo <= hi <= 1, got [$lo, $hi]")
    val q = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(lo)).as("__qlo"),
      percentile(col(valueCol), lit(hi)).as("__qhi"))
    df.join(broadcast(q), groupCol)
      .withColumn(outCol,
        least(greatest(col(valueCol).cast("double"), col("__qlo")), col("__qhi")))
      .drop("__qlo", "__qhi")
  }

  /** GROUP K-FOLD assignment — leakage-safe cross-validation: near-dup
    * CLUSTERS (connected components of `pairs`), not individual rows, are
    * dealt into `k` folds, so every member of a cluster shares a fold (no
    * train/eval contamination — the [[leakageSafeSplit]] guarantee, for k
    * folds) and the fold GROUP counts are exactly balanced (±1): clusters
    * rank in the deterministic md5 order of their representative and
    * fold = rank mod k.
    *
    * Scale shape: components for the clusters, one distinct for the
    * representative domain, and [[graft.operators.OrderedScan.rowNumber]]
    * for the global rank (bucket-stitched — a representative domain is
    * corpus-sized, so a bare global window would single-task). Appends
    * (rep_id, fold). */
  def groupKFold(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      k: Int): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    require(Seq("rep_id", "fold", "cluster").forall(!df.columns.contains(_)),
      "rep_id/fold/cluster are reserved by groupKFold")
    val comp = Dedup.components(pairs)
      .select(col("id").as(idCol), col("cluster"))
    val withRep = df.join(comp, Seq(idCol), "left_outer")
      .withColumn("rep_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
    val reps = withRep.select(col("rep_id")).distinct()
      .withColumn("__mk", md5(col("rep_id").cast("string")))
    // the usual unpartitioned-ordered-op routing (KSeries/Windowing
    // discipline): below the global-window byte gate a plain Window.orderBy
    // is the right plan — ONE small window task instead of the stitch's
    // boundary-sampling jobs, which at test SF are pure scheduler latency;
    // above the gate the bucket-stitched rowNumber keeps ranking
    // distributed. The gate reads the BASE frame's id projection, not
    // `reps`: rep ids are a subset of df's ids (labels are cluster-min
    // ids), and join-derived stats over-estimate so badly the small path
    // would never fire.
    val gateDf = df.select(col(idCol).cast("string").as("__mk"))
    val ranked = (if (graft.operators.OrderedScan.autoRoutes(gateDf, "__mk"))
      // rowNumber's MEASURED bucket sizing takes one aggregation pass over
      // its input before the ranking pass; `reps`' lineage (components
      // over the candidate pairs, a join, a distinct) is the most
      // expensive plan any ordered-scan caller feeds, so materialize it
      // once — ids-only, corpus-bounded — instead of re-executing the
      // whole LSH→components pipeline for the sizing pass (the r15
      // bench's one flag, q255: ~+0.4 s from exactly this re-execution)
      graft.operators.OrderedScan.rowNumber(reps.localCheckpoint(true), "__mk", "__r")
    else {
      import org.apache.spark.sql.expressions.Window
      reps.withColumn("__r",
        row_number().over(Window.orderBy(col("__mk"))).cast("long") - 1)
    }).select(col("rep_id"), pmod(col("__r"), lit(k.toLong)).as("fold"))
    withRep.join(ranked, Seq("rep_id"))
  }
}
