package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable sketches — the incremental-profiling surface of a 100 TB
  * pipeline: a per-shard sketch is a small, STORABLE intermediate that
  * merges associatively, so a nightly profile unions yesterday's sketches
  * with today's shard instead of rescanning the corpus. Spark 4 ships the
  * Apache DataSketches HLL family natively (`hll_sketch_agg` /
  * `hll_union_agg` / `hll_sketch_estimate` — codegen'd aggregates, no
  * UDFs), which this module composes; the reference has no sketch surface
  * (additive, SURVEY §4.5's approximate-stats track).
  */
object Sketches {

  /** Per-group distinct-count census with an HLL CERTIFICATE — the
    * honesty pattern of q135: the emitted count is EXACT (oracle-checkable
    * on any engine), and the sketch path runs beside it with an in-query
    * error-bound flag, so a cross-engine hash match certifies that the
    * sharded-and-merged sketch estimate landed within `relErrPpm` of
    * truth. The sketches are built PER SHARD first and merged second —
    * exactly the store-then-union lifecycle an incremental profile uses —
    * so the certificate also covers mergeability, not just one-shot
    * estimation.
    *
    * Scale shape: two map-side-partial aggregates (shard sketches ≈
    * #groups×#shards 4 KiB blobs, then the union) plus the exact
    * count-distinct (one expand shuffle — the part you'd DROP at 100 TB,
    * keeping only the sketch arm; it exists here as the verification
    * baseline). Default lgConfigK=12 gives ~1.6 % standard error, well
    * inside the 5 % default gate. */
  def distinctCensusHll(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      shard: Column,
      relErrPpm: Long = 50000): DataFrame = {
    require(relErrPpm > 0, s"relErrPpm $relErrPpm must be positive")
    val shards = df.groupBy(col(groupCol), shard.as("__shard"))
      .agg(hll_sketch_agg(col(valueCol)).as("__sk"))
    val merged = shards.groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_distinct"))
    // null-SAFE equi-join: both arms aggregate a NULL group (SQL GROUP BY
    // keeps it) — a plain inner join would silently drop that whole group
    exact.join(merged, exact(groupCol) <=> merged(groupCol))
      .drop(merged(groupCol))
      .withColumn("within",
        (abs(col("__est") - col("n_distinct")) * lit(1000000L) <=
          col("n_distinct") * lit(relErrPpm)).cast("long"))
      .select(col(groupCol), col("n_distinct"), col("within"))
  }

  /** PERSISTED sketch state — the full incremental-profile lifecycle that
    * [[distinctCensusHll]] only simulates in-query: per-(group, unit) HLL
    * blobs are WRITTEN to parquet once (the nightly job's output), and
    * the census is answered by UNIONING the read-back blobs — tonight's
    * run would append one more unit's sketches and never rescan history.
    * Exact arm + certificate as in the q186 honesty pattern. */
  def persistedDistinctCensusHll(
      spark: org.apache.spark.sql.SparkSession,
      statePath: String,
      df: DataFrame,
      groupCol: String,
      unitCol: Column,
      valueCol: String,
      relErrPpm: Long = 50000): DataFrame = {
    require(relErrPpm > 0, s"relErrPpm $relErrPpm must be positive")
    val p = new org.apache.hadoop.fs.Path(statePath + "/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      df.groupBy(col(groupCol), unitCol.as("__unit"))
        .agg(hll_sketch_agg(col(valueCol)).as("__sk"))
        .write.mode("overwrite").parquet(statePath)
    val merged = spark.read.parquet(statePath)
      .groupBy(col(groupCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("n_distinct"))
    exact.join(merged, exact(groupCol) <=> merged(groupCol))
      .drop(merged(groupCol))
      .withColumn("within",
        (abs(col("__est") - col("n_distinct")) * lit(1000000L) <=
          col("n_distinct") * lit(relErrPpm)).cast("long"))
      .select(col(groupCol), col("n_distinct"), col("within"))
  }

  // ------------------------------------------------------------------
  // Theta sketches — mergeable distinct SET ALGEBRA (HLL can only union;
  // theta intersects and differences, the ask behind "how many users did
  // BOTH event types" over stored per-shard profiles).
  // ------------------------------------------------------------------

  import org.apache.datasketches.memory.Memory
  import org.apache.datasketches.theta.{SetOperation, Sketches => DsSketches, UpdateSketch}

  private def emptyTheta: Array[Byte] =
    UpdateSketch.builder().build().compact().toByteArray

  /** Merge-only theta aggregator: inputs are COMPACT sketch blobs (one per
    * shard — built imperatively per partition below, never per row), so
    * reduce cost is per-blob, not per-row. */
  private object ThetaUnionAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val u = SetOperation.builder().buildUnion()
      u.union(DsSketches.wrapSketch(Memory.wrap(a)))
      u.union(DsSketches.wrapSketch(Memory.wrap(b)))
      u.getResult.toByteArray
    }
    def zero: Array[Byte] = emptyTheta
    def reduce(b: Array[Byte], in: Array[Byte]): Array[Byte] = union2(b, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union2(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** One merged theta sketch blob per group over the STRING value column.
    * Shard build is per-partition imperative (a Map[group, UpdateSketch]
    * per input partition, one compact blob emitted per (partition, group))
    * — the shuffle then carries #partitions×#groups blobs, never rows. */
  def thetaPerGroup(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val shards = df.select(col(groupCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val sketches = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (g, v) =>
          if (g != null && v != null)
            sketches.getOrElseUpdate(g, UpdateSketch.builder().build()).update(v)
        }
        sketches.iterator.map { case (g, sk) => (g, sk.compact().toByteArray) }
      }
      .toDF(groupCol, "__blob")
    shards.groupBy(col(groupCol))
      .agg(udaf(ThetaUnionAgg).apply(col("__blob")).as("__sketch"))
  }

  /** Pairwise distinct-set INTERSECTION census with a theta CERTIFICATE
    * (the q186 honesty pattern): for each unordered group pair, the EXACT
    * count of shared distinct values (oracle-checkable) plus a flag that
    * the intersect-of-merged-shard-sketches estimate landed within
    * `relErrPpm`. The sketch arm is what survives at 100 TB — per-group
    * blobs are storable and intersect in milliseconds; the exact arm is
    * the verification baseline (a value-keyed self-join on the distinct
    * (group, value) domain, the q211 shape).
    *
    * Default nominal entries (4096) give ~1.6 % RSE per sketch; the 10 %
    * default gate covers intersection error inflation at moderate overlap
    * (theta intersection error grows as overlap shrinks — tiny true
    * intersections are reported exactly by the exact arm regardless). */
  def intersectCensusTheta(
      df: DataFrame, groupCol: String, valueCol: String,
      relErrPpm: Long = 100000): DataFrame = {
    require(relErrPpm > 0, s"relErrPpm $relErrPpm must be positive")
    val sk = thetaPerGroup(df, groupCol, valueCol).localCheckpoint(true)
    val intersectEst = udf { (a: Array[Byte], b: Array[Byte]) =>
      val i = SetOperation.builder().buildIntersection()
      i.intersect(DsSketches.wrapSketch(Memory.wrap(a)))
      i.intersect(DsSketches.wrapSketch(Memory.wrap(b)))
      i.getResult.getEstimate
    }
    // exact arm: distinct (group, value) domain, value-keyed self-join
    val dom = df.select(col(groupCol).cast("string").as("__g"),
        col(valueCol).cast("string").as("__v"))
      .where(col("__g").isNotNull && col("__v").isNotNull)
      .distinct().localCheckpoint(true)
    val exact = dom.as("a").join(dom.as("b"),
        col("a.__v") === col("b.__v") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("g1"), col("b.__g").as("g2"))
      .agg(count(lit(1)).as("n_shared"))
    val pairs = sk.as("sa").join(sk.as("sb"),
        col(s"sa.$groupCol") < col(s"sb.$groupCol"))
      .select(col(s"sa.$groupCol").as("g1"), col(s"sb.$groupCol").as("g2"),
        intersectEst(col("sa.__sketch"), col("sb.__sketch")).as("__est"))
    // left join: pairs with NO shared values are absent from `exact`
    pairs.join(exact, Seq("g1", "g2"), "left_outer")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("within",
        (abs(col("__est") - col("n_shared")) * lit(1000000L) <=
          greatest(col("n_shared"), lit(100L)) * lit(relErrPpm)).cast("long"))
      .select(col("g1"), col("g2"), col("n_shared"), col("within"))
  }

  // ------------------------------------------------------------------
  // KLL quantile sketches — mergeable rank/quantile profiles with a
  // PROVEN rank-error bound (vs approx_percentile's GK variant).
  // ------------------------------------------------------------------

  import org.apache.datasketches.kll.KllDoublesSketch

  private object KllMergeAgg
      extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    private def merge2(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      val s = KllDoublesSketch.heapify(Memory.wrap(a))
      s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
      s.toByteArray
    }
    def zero: Array[Byte] = KllDoublesSketch.newHeapInstance().toByteArray
    def reduce(b: Array[Byte], in: Array[Byte]): Array[Byte] = merge2(b, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = merge2(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Per-group quantile census with a KLL rank CERTIFICATE: emits the
    * EXACT ×4 quantiles (binary-exact interpolation, the q212 convention —
    * oracle-checkable) for each requested rank, plus a flag that the KLL
    * estimate's EXACT RANK sits within `2 × normalizedRankError` of the
    * target — KLL's guarantee is on rank, not value, so that is the
    * honest thing to certify. Shard build is per-partition imperative
    * (blobs, not rows, hit the shuffle); the exact arm (holistic
    * percentile + a rank-count pass against the estimates) is the
    * verification baseline you drop at 100 TB. */
  def quantileCensusKll(
      df: DataFrame, groupCol: String, valueCol: String,
      ranks: Seq[Double]): DataFrame = {
    require(ranks.nonEmpty && ranks.forall(r => r > 0 && r < 1), s"bad ranks $ranks")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string"), col(valueCol).cast("long"))
      .where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .as[(String, Long)]
    val shards = base.mapPartitions { it =>
      val sketches = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
      it.foreach { case (g, v) =>
        sketches.getOrElseUpdate(g, KllDoublesSketch.newHeapInstance()).update(v.toDouble)
      }
      sketches.iterator.map { case (g, sk) => (g, sk.toByteArray) }
    }.toDF(groupCol, "__blob")
    val merged = shards.groupBy(col(groupCol))
      .agg(udaf(KllMergeAgg).apply(col("__blob")).as("__sk"))
    val estAt = udf { (blob: Array[Byte], r: Double) =>
      val s = KllDoublesSketch.heapify(Memory.wrap(blob))
      if (s.isEmpty) None else Some(s.getQuantile(r))
    }
    val tolPpm = udf { (blob: Array[Byte]) =>
      val s = KllDoublesSketch.heapify(Memory.wrap(blob))
      math.round(2.0e6 * s.getNormalizedRankError(false))
    }
    val ests = merged.crossJoin(broadcast(ranks.toDF("__r")))
      .select(col(groupCol), col("__r"),
        estAt(col("__sk"), col("__r")).as("__est"),
        tolPpm(col("__sk")).as("__tol"))
      .localCheckpoint(true) // groups×ranks rows; two consumers below
    // exact arm 1: ×4 exact quantiles unpivoted to (group, rank, q4)
    val exact = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(array(ranks.map(r => struct(lit(r).as("__r"),
          percentile(col(valueCol).cast("long") * 4, lit(r)).cast("long")
            .as("q4"))): _*).as("__qs"))
      .select(col(groupCol), explode(col("__qs")).as("__e"))
      .select(col(groupCol), col("__e.__r").as("__r"), col("__e.q4").as("q4"))
    // exact arm 2: the exact rank of each KLL estimate — ONE conditional
    // count agg over the corpus against the broadcast (group, rank, est)
    val cnt = df.where(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as(groupCol),
        col(valueCol).cast("long").as("__v"))
      .join(broadcast(ests.select(col(groupCol), col("__r"), col("__est"))),
        Seq(groupCol))
      .groupBy(col(groupCol), col("__r"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__v").cast("double") <= col("__est"), 1L).otherwise(0L))
          .as("__below"))
    // the rank gate needs a DISCRETE floor: ranks move in 1/n steps, so
    // for tiny groups (n < ~1/rankError) the ±1-value discretization
    // dominates KLL's continuous bound — allow 1.5 value-steps of slack
    ests.join(exact, Seq(groupCol, "__r"))
      .join(cnt, Seq(groupCol, "__r"))
      .withColumn("within",
        (abs(col("__below") * lit(1000000L) -
             (col("__r") * lit(1000000L)).cast("long") * col("__n")) <=
          greatest(col("__tol") * col("__n"), lit(1500000L))).cast("long"))
      .select(col(groupCol), (col("__r") * 1000).cast("long").as("rank_permille"),
        col("q4"), col("within"))
  }
}
