package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) layout for multi-column data skipping — the
  * lakehouse answer to "queries filter on BOTH user and time, but a sort
  * can only cluster one of them". Interleaving the bits of the two filter
  * columns gives a 1-D key whose range-partitioned, sorted layout keeps
  * every file's (colA, colB) bounding box SMALL on both dimensions, so
  * parquet min/max stats prune most files for any 2-D rectangle predicate
  * — where a linear sort prunes on its leading column only.
  *
  * The z-value is pure codegen'd bit arithmetic (constant-shift
  * `shiftleft`/`shiftright`, unrolled over `bits` positions — no UDF); the
  * write is ONE `repartitionByRange` (range exchange with a sampled
  * boundary pass) + an in-partition sort, exactly what a nightly layout
  * compaction job can afford. Reading back needs nothing special: the
  * engine's ordinary min/max row-group pruning does the skipping.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of two NON-NEGATIVE integer
    * columns (a's bit i lands at 2i+1, b's at 2i — a 2·bits-bit z-value).
    * Values above 2^bits-1 clamp to the top cell (monotone, so ordering
    * degrades gracefully rather than wrapping). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range 1..31")
    val cap = (1L << bits) - 1
    val ca = least(a.cast("long"), lit(cap))
    val cb = least(b.cast("long"), lit(cap))
    (0 until bits).map { i =>
      val abit = shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-ordered on (`colA`, `colB`) into `numFiles` parquet
    * files: range-partition on the z-value (contiguous curve segments per
    * file), sort within each, drop the helper column. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, numFiles: Int): Unit = {
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Idempotent ensure-written (the bucketed-table convention): build the
    * z-ordered copy once per (input, layout) and reuse it across runs. */
  def ensureZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int, numFiles: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) writeZOrdered(df, path, colA, colB, bits, numFiles)
  }

  /** Per-file (min, max) bounding boxes of two columns — the skipping
    * AUDIT: the fraction of files whose box intersects a query rectangle
    * is exactly the fraction of files a stats-pruning scan must read.
    * One pass grouped by `input_file_name` (file count rows out). */
  def fileBoxes(spark: SparkSession, path: String, colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))
}
