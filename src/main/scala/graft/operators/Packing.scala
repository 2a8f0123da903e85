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

  /** TRAINING-SEQUENCE boundary index — the artifact a pretraining
    * dataloader actually consumes: documents concatenate in md5(id) order
    * (the deterministic global shuffle of `Sampling.shardAssign`, so
    * adjacent source docs scatter) into fixed `seqTokens`-token sequences,
    * and each document is mapped to (seq_id, tok_start, tok_end) — its
    * token span within its sequence. A document belongs to the sequence
    * where it STARTS; the budget-crossing document's tok_end overhangs
    * seqTokens (same contract as [[packByTokens]]: the loader truncates or
    * lets the sequence run long — membership never splits, so the map
    * stays one row per doc).
    *
    * Everything derives from ONE distributed prefix sum
    * ([[OrderedScan.runningSum]]'s two-level stitch) + narrow integer
    * arithmetic (DIV, no floats) — hash-exact on any engine and never a
    * global single-task window. `tokCol` must be integral (LongType).
    * Output: input columns + (seq_id, tok_start, tok_end). */
  def sequenceIndex(
      df: DataFrame,
      idCol: String,
      tokCol: String,
      seqTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    require(!df.columns.contains("__k"), "__k is reserved by sequenceIndex")
    val keyed = df.withColumn("__k", md5(col(idCol).cast("string")))
    OrderedScan.runningSum(keyed, "__k", tokCol, "__cum", buckets)
      // runningSum types the stitched sum double (carry add) — integrally
      // valued for an integral tokCol, so the cast back is exact (< 2^53)
      .withColumn("__cum", col("__cum").cast("long"))
      .withColumn("seq_id", expr(s"(__cum - `$tokCol`) DIV $seqTokens"))
      .withColumn("tok_start",
        col("__cum") - col(tokCol) - col("seq_id") * seqTokens)
      .withColumn("tok_end", col("tok_start") + col(tokCol))
      .drop("__cum", "__k")
  }

  /** DELTA sequence index — the ingest shape of [[sequenceIndex]]: append
    * an incoming batch to an existing training stream WITHOUT repacking
    * the corpus. The corpus contributes only its total token count (one
    * aggregate, broadcast as a 1-row frame); the batch gets its own
    * md5-order prefix sums offset by that total, so existing sequence ids
    * and spans never change (append-only determinism — re-exported shards
    * stay byte-identical) and the first batch doc continues the corpus's
    * last partial sequence. Output: batch columns + (seq_id, tok_start,
    * tok_end), same contract as [[sequenceIndex]]. */
  def sequenceIndexDelta(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      tokCol: String,
      seqTokens: Long,
      buckets: Int = 64): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    require(!batch.columns.contains("__k"), "__k is reserved by sequenceIndexDelta")
    val total = corpus.agg(
      coalesce(sum(col(tokCol)), lit(0L)).cast("long").as("__corpus_tok"))
    val keyed = batch.withColumn("__k", md5(col(idCol).cast("string")))
    OrderedScan.runningSum(keyed, "__k", tokCol, "__cum", buckets)
      .withColumn("__cum", col("__cum").cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("__start", col("__cum") - col(tokCol) + col("__corpus_tok"))
      .withColumn("seq_id", expr(s"__start DIV $seqTokens"))
      .withColumn("tok_start", col("__start") - col("seq_id") * seqTokens)
      .withColumn("tok_end", col("tok_start") + col(tokCol))
      .drop("__cum", "__k", "__start", "__corpus_tok")
  }

  /** Materialize the packed TRAINING SEQUENCES themselves: the documents of
    * each [[sequenceIndex]] sequence concatenated in stream order with an
    * `eos` separator — (seq_id, n_docs, n_tokens, seq_text). The reassembly
    * is a seq_id-keyed agg (parallel across sequences — each collects only
    * its own ≥~seqTokens tokens of text); order within a sequence comes
    * from the tok_start offsets, not any shuffle order, so the output is
    * deterministic on any engine/layout. Zero-token documents are excluded
    * (they have no position in the token stream). */
  def sequenceTexts(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tokCol: String,
      seqTokens: Long,
      eos: String = "<eos>",
      buckets: Int = 64): DataFrame = {
    val idx = sequenceIndex(df.where(col(tokCol) > 0), idCol, tokCol, seqTokens, buckets)
    idx.groupBy(col("seq_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokCol)).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("tok_start"), col(textCol)))),
          x => x.getField(textCol)), s" $eos ").as("seq_text"))
  }
}
