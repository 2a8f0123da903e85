package graft.functions

import org.apache.spark.sql.DataFrame

/** Parallelism helpers for CPU-bound per-row kernels. */
object Par {

  /** Widen a NARROW input before a CPU-heavy per-row kernel (md5 minhash
    * signatures, simhash bit votes, shingle hashing): when the scan yields
    * fewer partitions than the cluster's parallelism — a single small
    * parquet file, a collapsed AQE stage — the kernel serializes on a
    * handful of cores while the rest idle. A round-robin repartition to
    * `defaultParallelism` costs one shuffle of the (by definition small)
    * input and buys full-width kernel execution.
    *
    * When the input is already at least as wide as the cluster (the 100 TB
    * scan: thousands of file splits), this is the identity — no shuffle is
    * added on the production path. Reading `rdd.getNumPartitions` costs one
    * physical planning of the subtree (milliseconds), not an execution. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
