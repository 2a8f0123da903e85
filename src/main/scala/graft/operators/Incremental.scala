package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view pattern a
  * 100 TB nightly pipeline lives on: instead of rescanning the corpus,
  * keep an ALGEBRAIC partial-aggregate state table (per group × ingest
  * unit: count, sum, sum-of-squares — each mergeable by addition), union
  * yesterday's state with today's delta partials, and finalize statistics
  * from the merged sums. The sketch modules ([[graft.functions.Sketches]])
  * do this for distinct counts and quantiles; this is the exact-arithmetic
  * counterpart for moments.
  *
  * All sums are exact integers (values enter as cents), so the
  * incremental result is bit-identical to a full recompute — which is
  * exactly what the q225 oracle certifies.
  */
object Incremental {

  /** Partial-aggregate rows for `df` at (groupCol × unitCol) grain:
    * (group, unit, n, s_cents, ss_cents2). `cents` must be an integral
    * column (pre-scaled). sum-of-squares accumulates in decimal128 —
    * cents² reaches 10¹⁰ per row, so int64 would overflow past ~10⁸ rows
    * per unit. */
  def partials(df: DataFrame, groupCol: Column, unitCol: Column,
      cents: Column): DataFrame =
    df.select(groupCol.as("g"), unitCol.as("u"), cents.cast("long").as("__c"))
      .groupBy(col("g"), col("u"))
      .agg(count(lit(1)).as("n"), sum(col("__c")).as("s_cents"),
        sum((col("__c") * col("__c")).cast("decimal(38,0)")).as("ss_cents2"))

  /** Write a state table (idempotent-overwrite: state for an ingest unit
    * is replaced wholesale, the safe re-run semantics). */
  def writeState(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)

  /** Merge state partials with a delta's partials and FINALIZE per-group
    * statistics: n, exact sums, mean in centi-cents (truncating div) and
    * population variance in cents² (truncating div, decimal128
    * intermediates). Output: (g, n, s_cents, mean_cc, var_cents2). */
  def mergeFinalize(state: DataFrame, delta: DataFrame): DataFrame = {
    val merged = state.unionByName(delta)
      .groupBy(col("g"))
      .agg(sum(col("n")).as("n"), sum(col("s_cents")).as("s_cents"),
        sum(col("ss_cents2")).as("ss_cents2"))
    merged.select(col("g"), col("n"), col("s_cents"),
      expr("(s_cents * 100L) div n").as("mean_cc"),
      // n·ss − s² in decimal128; var = that div n² (population)
      expr("""CAST((CAST(n AS DECIMAL(38,0)) * ss_cents2
             |      - CAST(s_cents AS DECIMAL(38,0)) * s_cents)
             |     DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
        .as("var_cents2"))
  }

  /** The full maintained-view round-trip for a query: historical rows →
    * state parquet (written once per path), delta rows → partials merged
    * against the READ-BACK state. The parquet round-trip is the point —
    * state survives between runs, so tonight's job touches only the
    * delta. */
  def maintainedStats(spark: SparkSession, statePath: String,
      historical: DataFrame, delta: DataFrame,
      groupCol: Column, unitCol: Column, cents: Column): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(statePath + "/_SUCCESS")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      writeState(partials(historical, groupCol, unitCol, cents), statePath)
    mergeFinalize(
      spark.read.parquet(statePath),
      partials(delta, groupCol, unitCol, cents))
  }
}
