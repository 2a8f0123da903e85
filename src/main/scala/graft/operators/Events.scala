package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over an (entity, timestamp, type, value) log —
  * ordered funnels, cohort retention, transition matrices and marketing
  * attribution. The reference frame library stops at sessionization-style
  * windowing (reference `src/Series.fs` Aggregate/windowWhile); these are
  * the additive product-analytics shapes its users build on top, expressed
  * Spark-first: everything is key-parallel per entity (one hash shuffle on
  * the entity key, never a global sort), counts and fixed-point ppm ratios
  * are exact integers, so every result hash-matches a SQL oracle.
  */
object Events {

  /** Ordered k-step funnel: for each entity, step 1 is its earliest
    * `steps(0)` event; step i is the earliest `steps(i-1)` event STRICTLY
    * after the step-(i-1) time. Output: one row per step — (step 1-based,
    * step_name, entities reached, conv_ppm vs step 1, integer DIV).
    *
    * ONE shuffle on the entity key: the groupBy collects, per entity, the
    * step-1 minimum plus one timestamp array PER LATER STEP (only that
    * step's events — the map side projects everything else to null, which
    * `collect_list` drops), then a chain of codegen'd higher-order
    * `filter`/`array_min` picks each "earliest after t_{i-1}" without a
    * second pass. Per-entity state is bounded by that entity's per-step
    * event count — the standard per-user-bounded assumption of funnel
    * analytics (cap upstream if an entity can be adversarially hot; the
    * equivalent k-join form the oracle uses trades k extra shuffles of the
    * full log for O(1) state and stays the fallback). A null step time
    * poisons every later comparison to null, so unreached prefixes
    * propagate — no entity can reach step i without step i-1. */
  def funnel(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got $steps")
    val firstAgg =
      min(when(col(typeCol) === steps.head, col(tsCol))).as("__t1")
    val listAggs = steps.tail.zipWithIndex.map { case (s, i) =>
      collect_list(when(col(typeCol) === s, col(tsCol))).as(s"__l${i + 2}")
    }
    val perEntity = events.groupBy(col(entityCol))
      .agg(firstAgg, listAggs: _*)
    // chain: __t{i} = min of step-i times strictly after __t{i-1}
    val withTimes = steps.tail.zipWithIndex.foldLeft(perEntity) {
      case (df, (_, i)) =>
        val k = i + 2
        df.withColumn(s"__t$k",
          array_min(filter(col(s"__l$k"), x => x > col(s"__t${k - 1}"))))
    }
    val countCols = steps.indices.map(i =>
      sum(when(col(s"__t${i + 1}").isNotNull, 1L).otherwise(0L))
        .as(s"__c${i + 1}"))
    stageRows(withTimes.agg(countCols.head, countCols.tail: _*), steps)
  }

  /** Shared funnel output shape: a 1-row frame of per-step reach counts
    * (`__c1..__ck`) exploded to (step, step_name, entities, conv_ppm)
    * rows — used by the batch form above and the streaming state-machine
    * form ([[graft.streaming.Streams.funnelStages]]). */
  private[graft] def stageRows(reached: DataFrame, steps: Seq[String]): DataFrame = {
    val stepRows = array(steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("step_name"),
        col(s"__c${i + 1}").as("entities"))
    }: _*)
    reached.select(explode(stepRows).as("r"), col("__c1"))
      .select(col("r.step").as("step"), col("r.step_name").as("step_name"),
        col("r.entities").as("entities"),
        expr("r.entities * 1000000L DIV __c1").as("conv_ppm"))
  }

  /** Weekly cohort retention: cohort = Monday-truncated week of the
    * entity's FIRST event; an entity is retained at offset w if it has any
    * event in cohort_week + w weeks. Output (cohort_week DATE, week_offset,
    * entities), one row per non-empty cell of the retention triangle.
    *
    * Two hash aggregates and one equi-join, all keyed on the entity id:
    * first-event per entity (map-side-combinable min), the distinct
    * (entity, active-week) projection, and the join that tags each active
    * week with its cohort — then a final (cohort, offset) count. The join
    * carries one row per entity-week (bounded by the calendar), never the
    * raw log. Offsets are exact integer day-diffs DIV 7, so engines can't
    * disagree on week arithmetic. */
  def cohortRetention(
      events: DataFrame,
      entityCol: String,
      tsCol: String): DataFrame = {
    val firstEvent = events.groupBy(col(entityCol))
      .agg(min(col(tsCol)).as("__first"))
      .select(col(entityCol),
        to_date(date_trunc("week", col("__first"))).as("__cohort"))
    val activeWeeks = events
      .select(col(entityCol),
        to_date(date_trunc("week", col(tsCol))).as("__week"))
      .distinct()
    activeWeeks.join(firstEvent, Seq(entityCol))
      .select(col("__cohort"),
        expr("CAST(datediff(__week, __cohort) AS BIGINT) DIV 7")
          .as("week_offset"),
        col(entityCol))
      .groupBy(col("__cohort").as("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("entities"))
      .select(col("cohort_week"), col("week_offset"), col("entities"))
  }

  /** First-order Markov transition matrix of event types per entity:
    * count of (prev_type -> next_type) over each entity's time-ordered
    * event sequence, with a fixed-point row-conditional probability
    * (p_ppm = count·1e6 DIV out-degree of prev_type, integer DIV).
    *
    * The lag rides an entity-PARTITIONED window — key-parallel, state is
    * one row, no global sort anywhere (the partitioned complement of the
    * OrderedScan stitch, same routing as the per-user diff family). Ties
    * in `tsCol` break on `idCol` so the sequence — and therefore the hash
    * — is deterministic cross-engine. The transition agg is
    * map-side-combinable on a (|types|², tiny) key space. */
  def markovTransitions(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(entityCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
    val counts = pairs.groupBy(col("__prev").as("prev_type"),
        col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("transitions"))
    counts
      .withColumn("p_ppm",
        expr("transitions * 1000000L DIV sum(transitions) OVER " +
          "(PARTITION BY prev_type)"))
      .select(col("prev_type"), col("next_type"), col("transitions"),
        col("p_ppm"))
  }

  /** Last-touch attribution: each conversion event is credited to the
    * LATEST touch event (any type in `touchTypes`) of the same entity
    * strictly before it and within `horizonSec`; conversions with no such
    * touch credit "(none)". Output per touch type: conversions, revenue
    * in exact cents (fixed-point BIGINT of the conversion's `valueCol`),
    * and the summed touch→conversion delay in whole seconds (integer DIV
    * of the µs difference).
    *
    * This is the grouped as-of join expressed as the union+window form of
    * [[AsOf.join]]: touches and conversions interleave in ONE
    * entity-partitioned window ordered by (ts, id) — key-parallel, one
    * shuffle of the filtered log, state = one struct per row
    * (`last_value` with ignoreNulls skips conversion rows), no join
    * against the raw log at all. The horizon check compares exact µs
    * longs, so boundary events land identically cross-engine. */
  def lastTouchAttribution(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      valueCol: String,
      touchTypes: Seq[String],
      conversionType: String,
      horizonSec: Long): DataFrame = {
    val relevant = events
      .where(col(typeCol).isin(touchTypes :+ conversionType: _*))
      .select(col(entityCol), col(tsCol), col(idCol), col(typeCol),
        col(valueCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touchStruct = when(col(typeCol) =!= conversionType,
      struct(col(tsCol).as("ts"), col(typeCol).as("tp")))
    val attributed = relevant
      .withColumn("__touch", last(touchStruct, ignoreNulls = true).over(w))
      .where(col(typeCol) === conversionType)
      .withColumn("__delay_us",
        unix_micros(col(tsCol)) - unix_micros(col("__touch.ts")))
      .withColumn("touch_type",
        when(col("__touch").isNotNull &&
            col("__delay_us") <= horizonSec * 1000000L, col("__touch.tp"))
          .otherwise(lit("(none)")))
    attributed.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("conversions"),
        sum(expr(s"CAST(round($valueCol * 100) AS BIGINT)"))
          .as("revenue_cents"),
        sum(when(col("touch_type") =!= "(none)",
            expr("__delay_us DIV 1000000")).otherwise(lit(0L)))
          .as("delay_s_total"))
      .select(col("touch_type"), col("conversions"), col("revenue_cents"),
        col("delay_s_total"))
  }

  /** Top entity journey prefixes: each entity's first `k` event types in
    * time order, joined as a `>`-separated path string, counted across
    * entities — the "what do users do first" panel. Ties in `tsCol`
    * break on `idCol` (deterministic cross-engine); entities with fewer
    * than `k` events contribute their shorter prefix.
    *
    * The rank is an entity-partitioned window (key-parallel, no global
    * sort); the prefix join collects at most `k` rows per entity
    * (`sort_array` on (rank, type) structs makes the collect order
    * deterministic — `collect_list` alone is not); the path count is a
    * map-side-combinable agg on a |types|^k-bounded key space. */
  def pathCounts(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(entityCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(col(entityCol))
      .agg(sort_array(collect_list(struct(col("__rn").as("rn"),
        col(typeCol).as("tp")))).as("__steps"))
      .select(concat_ws(">", transform(col("__steps"), s => s("tp")))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
  }

  /** Survival / retention curve: for each week offset w, how many
    * entities have a LIFESPAN (whole weeks between first and last event,
    * integer day-diff DIV 7) of at least w, plus the fixed-point
    * survivor fraction. With every entity observed to its last event
    * this IS the Kaplan-Meier estimator (no censoring: S(w) =
    * survivors(w)/total exactly) — and everything stays integer, so the
    * curve hash-matches a SQL oracle.
    *
    * One entity-keyed agg computes lifespans; each entity then fans out
    * to its (0..lifespan) offsets — rows bounded by entities × calendar
    * weeks, the dense-curve trade that keeps zero-death weeks present —
    * and a tiny offset-keyed agg counts survivors. Total is a 1-row
    * broadcast. */
  def survivalCurve(
      events: DataFrame,
      entityCol: String,
      tsCol: String): DataFrame = {
    val life = events.groupBy(col(entityCol))
      .agg(expr(s"CAST(datediff(max(CAST($tsCol AS DATE)), " +
        s"min(CAST($tsCol AS DATE))) AS BIGINT) DIV 7").as("__life"))
    val total = life.agg(count(lit(1)).as("__total"))
    life.select(explode(sequence(lit(0L), col("__life"))).as("week_offset"))
      .groupBy(col("week_offset"))
      .agg(count(lit(1)).as("survivors"))
      .crossJoin(broadcast(total))
      .select(col("week_offset"), col("survivors"),
        expr("survivors * 1000000L DIV __total").as("survival_ppm"))
  }

  /** Conversion-lag distribution: per entity, the delay from its FIRST
    * `fromType` event to the first `toType` event strictly after it, then
    * the population's n / quarter-quantiles / mean / max — the "how long
    * does view→purchase take" panel. All integer: delays are whole
    * seconds (µs diff DIV 1e6); p25/p50/p75 are exact interpolated
    * quantiles ×4 (quantile positions at quarter fractions are
    * binary-exact, so 4·q is an exact integer cross-engine); the mean is
    * a truncating DIV.
    *
    * Two entity-keyed aggs + one entity equi-join (key-parallel); the
    * final reduction is one row. Entities that never convert drop out
    * (inner join + min-filter), matching the funnel's reached-set
    * semantics. */
  def conversionLag(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      fromType: String,
      toType: String,
      typeCol: String): DataFrame = {
    val base = events.select(col(entityCol).as("__e"),
      unix_micros(col(tsCol)).as("__us"), col(typeCol).as("__tp"))
    val first = base.groupBy(col("__e"))
      .agg(min(when(col("__tp") === fromType, col("__us"))).as("__t1"))
      .where(col("__t1").isNotNull)
    val conv = base.join(first, Seq("__e"))
      .where(col("__tp") === toType && col("__us") > col("__t1"))
      .groupBy(col("__e"), col("__t1"))
      .agg(min(col("__us")).as("__t2"))
      .select(expr("(__t2 - __t1) DIV 1000000").as("__d"))
    conv.agg(
      count(lit(1)).as("n"),
      expr("CAST(4 * percentile(__d, 0.25) AS BIGINT)").as("p25_sx4"),
      expr("CAST(4 * percentile(__d, 0.5) AS BIGINT)").as("p50_sx4"),
      expr("CAST(4 * percentile(__d, 0.75) AS BIGINT)").as("p75_sx4"),
      max(col("__d")).as("max_s"),
      expr("sum(__d) DIV count(1)").as("mean_s"))
  }

  /** ASSOCIATION RULES over per-entity behavior baskets (market-basket
    * analysis, the Agrawal-Srikant apriori output for 1→1 rules): basket =
    * the set of distinct event types an entity ever performed; for every
    * ordered type pair A→B, exact-integer support / confidence / lift in
    * ppm (lift > 10⁶ ⇔ positive association beyond independence — the
    * panel Markov row-conditionals q200 don't give).
    *
    * The corpus collapses ONCE to the distinct (entity, type) domain;
    * co-occurrence is an entity-keyed self-join with fan-out ≤ |types|²
    * per entity; singles and the entity total are domain aggregates
    * broadcast back. All divisions truncating — engine-exact.
    * Output: (ante, cons, n_both, support_ppm, confidence_ppm, lift_ppm). */
  def associationRules(events: DataFrame, entityCol: String,
      itemCol: String): DataFrame = {
    val dom = events.select(col(entityCol).as("__e"), col(itemCol).as("__i"))
      .where(col("__e").isNotNull && col("__i").isNotNull)
      .distinct().localCheckpoint(true)
    val singles = dom.groupBy(col("__i")).agg(count(lit(1)).as("__n1"))
    val nRow = dom.agg(count_distinct(col("__e")).as("__n"))
    val both = dom.as("a")
      .join(dom.as("b"), col("a.__e") === col("b.__e") &&
        col("a.__i") =!= col("b.__i"))
      .groupBy(col("a.__i").as("ante"), col("b.__i").as("cons"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(singles.select(col("__i").as("ante"), col("__n1").as("__na"))),
        Seq("ante"))
      .join(broadcast(singles.select(col("__i").as("cons"), col("__n1").as("__nb"))),
        Seq("cons"))
      .crossJoin(broadcast(nRow))
      .select(col("ante"), col("cons"), col("n_both"),
        expr("(n_both * 1000000L) div __n").as("support_ppm"),
        expr("(n_both * 1000000L) div __na").as("confidence_ppm"),
        expr("(n_both * __n * 1000000L) div (__na * __nb)").as("lift_ppm"))
      .orderBy(col("ante"), col("cons"))
  }

  /** TIME-WEIGHTED average value (TWAP) per (group, day) — each
    * observation holds until the next one, so its weight is the gap to
    * the successor (the last observation of a day carries no interval and
    * drops out; a 1-observation day yields no row). Exact integers: cents
    * × µs gaps accumulate in decimal128, one truncating div at the end.
    * The lag rides a (group, day)-partitioned window — key-parallel, no
    * global ordering. Output: (g, day, n_intervals, twap_cents). */
  def twap(events: DataFrame, groupCol: Column, tsCol: Column,
      valueCents: Column): DataFrame = {
    val base = events.select(groupCol.as("g"), to_date(tsCol).as("day"),
      unix_micros(tsCol).as("__us"), valueCents.cast("long").as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g"), col("day")).orderBy(col("__us"), col("__c"))
    val gapped = base
      .withColumn("__gap", lead(col("__us"), 1).over(w) - col("__us"))
      .where(col("__gap").isNotNull)
    gapped.groupBy(col("g"), col("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum((col("__c") * col("__gap")).cast("decimal(38,0)")).as("__wsum"),
        sum(col("__gap")).as("__tsum"))
      .where(col("__tsum") > 0)
      .select(col("g"), col("day"), col("n_intervals"),
        expr("CAST(__wsum DIV __tsum AS BIGINT)").as("twap_cents"))
      .orderBy(col("g"), col("day"))
  }

  /** Sessionized ENTRY/BOUNCE analysis — gap-based sessions (a new
    * session when the entity pauses longer than `gapMinutes`), then per
    * ENTRY event type: how many sessions open with it and how many bounce
    * (single-event sessions) — the landing-page quality panel.
    *
    * All windows are entity-partitioned (key-parallel; never a global
    * sort): the session break is a lag over (µs, type), the session id a
    * running sum of breaks, the entry the lexicographic-min (µs, type)
    * struct per session (deterministic under timestamp ties). Bounce rate
    * is integer ppm. Output: (entry_type, n_sessions, n_bounces,
    * bounce_ppm) sorted. */
  def entryBounceRates(events: DataFrame, entityCol: String, tsCol: Column,
      typeCol: Column, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val base = events.select(col(entityCol).as("__e"),
      unix_micros(tsCol).as("__us"), typeCol.as("__tp"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__e")).orderBy(col("__us"), col("__tp"))
    val sess = base
      .withColumn("__brk",
        when(col("__us") - lag(col("__us"), 1).over(wOrd) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__brk")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__e"))
          .orderBy(col("__us"), col("__tp"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val perSession = sess.groupBy(col("__e"), col("__sid"))
      .agg(min(struct(col("__us"), col("__tp"))).getField("__tp").as("entry"),
        count(lit(1)).as("__n"))
    perSession.groupBy(col("entry").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("__n") === 1L, 1L).otherwise(0L)).as("n_bounces"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
        expr("(n_bounces * 1000000L) div n_sessions").as("bounce_ppm"))
      .orderBy(col("entry_type"))
  }

  /** BITMAP-INDEX day-intersection matrix — |A∩B| for every day pair,
    * EXACTLY, from packed user bitmaps: each (day, word) row holds 64
    * users as one long (`bit_or` of shifted bits, map-side combinable),
    * and an intersection is a word-keyed equi-join + `bit_count(a & b)`
    * sum. Versus the distinct-domain self-join (the q227 shape), the
    * bitmap form moves |days|·|users|/64 longs instead of |days|·|users|
    * ids and turns each pair-day overlap into bitwise ops — the classic
    * bitmap-index trade, exact as long as ids are integers (any density;
    * absent ids simply never set a bit).
    *
    * Output: (day_a < day_b, n_a, n_b, n_both) for pairs with n_both > 0
    * — the retention/return-visit matrix. */
  def dayIntersectionMatrix(events: DataFrame, userCol: String,
      tsCol: Column): DataFrame = {
    val dom = events.select(to_date(tsCol).as("__d"), col(userCol).as("__u"))
      .where(col("__d").isNotNull && col("__u").isNotNull)
      .distinct()
    val bits = dom
      .groupBy(col("__d"), expr("int(__u div 64)").as("__w"))
      .agg(expr("bit_or(shiftleft(1L, int(__u % 64)))").as("__b"))
      .localCheckpoint(true) // three consumers: counts + both join sides
    val counts = bits.groupBy(col("__d"))
      .agg(sum(bit_count(col("__b"))).as("__n"))
    val pairs = bits.as("a")
      .join(bits.as("b"),
        col("a.__w") === col("b.__w") && col("a.__d") < col("b.__d"))
      .groupBy(col("a.__d").as("day_a"), col("b.__d").as("day_b"))
      .agg(sum(bit_count(col("a.__b").bitwiseAND(col("b.__b")))).as("n_both"))
      .where(col("n_both") > 0)
    pairs
      .join(broadcast(counts.select(col("__d").as("day_a"), col("__n").as("n_a"))),
        Seq("day_a"))
      .join(broadcast(counts.select(col("__d").as("day_b"), col("__n").as("n_b"))),
        Seq("day_b"))
      .select(col("day_a"), col("day_b"), col("n_a"), col("n_b"), col("n_both"))
      .orderBy(col("day_a"), col("day_b"))
  }

  /** Rolling ACTIVE-USER panel — DAU / 7-day WAU / 30-day MAU per
    * calendar day, the engagement dashboard every event pipeline feeds.
    * EXACT distinct counts, but never over the raw log: the corpus
    * collapses ONCE to the distinct (user, day) domain (map-side
    * combinable), and the rolling windows are a ≤30-way fan-out of that
    * compact domain against the broadcast day list — at 100 TB the heavy
    * input is touched once, everything after is |users|×|days| sized.
    * Sliding-window distinct does NOT decompose into per-day partials
    * (users repeat across days), which is why the fan-out join over the
    * domain is the right shape — or at much larger day counts, the
    * HLL-merge approximation ([[graft.functions.Sketches]]).
    * Output: (day, dau, wau7, mau30) sorted by day. */
  def activeUsers(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val dom = events.select(col(userCol).as("__u"), to_date(col(tsCol)).as("__d"))
      .where(col("__u").isNotNull && col("__d").isNotNull)
      .distinct().localCheckpoint(true)
    val days = dom.select(col("__d").as("day")).distinct()
    dom.join(broadcast(days),
        col("__d").between(date_sub(col("day"), 29), col("day")))
      .groupBy(col("day"))
      .agg(
        countDistinct(when(col("__d") === col("day"), col("__u"))).as("dau"),
        countDistinct(when(col("__d") >= date_sub(col("day"), 6), col("__u")))
          .as("wau7"),
        countDistinct(col("__u")).as("mau30"))
      .orderBy(col("day"))
  }

  /** INTERVAL-UNION coverage per entity (the classic gaps-and-islands
    * union-of-intervals): each event opens an interval
    * [ts, ts + durationUs(row)]; overlapping/adjacent intervals per entity
    * merge into islands, and the output is each entity's total covered
    * micros, island count, and widest single island — the "how much
    * wall-clock was this user actually active" panel that naive
    * sum-of-durations double-counts.
    *
    * Spark-first shape: every window is PARTITIONED BY the entity (one
    * hash shuffle, key-parallel — never a global sort): a lag-window marks
    * island starts (start > running max of prior ends), a running sum of
    * the marks assigns island ids, one groupBy folds islands, one more
    * folds entities. All arithmetic in exact long micros → hash-stable. */
  def intervalCoverage(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      durationUs: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = events
      .select(col(entityCol).as("__e"), unix_micros(col(tsCol)).as("__s"),
        (unix_micros(col(tsCol)) + durationUs).as("__x"))
      .where(col("__e").isNotNull && col("__x") >= col("__s"))
    val byStart = Window.partitionBy(col("__e"))
      .orderBy(col("__s").asc, col("__x").asc)
    // running max of PRIOR interval ends; the first interval of an entity
    // has no prior → NULL → island starts there
    val prevMaxEnd = max(col("__x")).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val marked = iv
      .withColumn("__new", when(prevMaxEnd.isNull || col("__s") > prevMaxEnd, 1L)
        .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(
        byStart.rowsBetween(Window.unboundedPreceding, 0)))
    marked
      .groupBy(col("__e"), col("__island"))
      .agg(min(col("__s")).as("__is"), max(col("__x")).as("__ix"))
      .groupBy(col("__e").as(entityCol))
      .agg(
        sum(col("__ix") - col("__is")).as("covered_us"),
        count(lit(1)).as("n_islands"),
        max(col("__ix") - col("__is")).as("max_island_us"))
  }
}
