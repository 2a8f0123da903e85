package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: assign documents, in key order, to
  * ~`targetTokens`-token bins (additive training-data operator; the
  * reference has no notion of token budgets).
  *
  * Bin id = floor(exclusive-prefix-sum(tokens) / target): contiguous docs
  * fill a bin until the budget is crossed, the spanning doc belongs to the
  * earlier bin — the standard streaming approximation of greedy packing,
  * and unlike true greedy it is ORDER-PARALLEL: the prefix sum is the only
  * sequential dependency, and that runs as [[OrderedScan.runningSum]]'s
  * two-level stitch (bucket shuffle + broadcast carry), never a single
  * task. */
object Packing {

  /** Append a `bin` column. `df` must carry an orderable `keyCol` and an
    * integral `tokCol`. */
  def packByTokens(
      df: DataFrame,
      keyCol: String,
      tokCol: String,
      targetTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(targetTokens > 0, "targetTokens must be positive")
    OrderedScan.runningSum(df, keyCol, tokCol, "__cum", buckets)
      .withColumn("bin",
        floor((col("__cum") - col(tokCol)) / targetTokens).cast("long"))
      .drop("__cum")
  }
}
