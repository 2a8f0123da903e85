package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Output compaction — the small-files answer at 100 TB: a job whose last
  * stage ran with thousands of tasks writes thousands of tiny parquet
  * files, and every DOWNSTREAM scan then pays file-listing + footer +
  * row-group overhead per file (and object stores throttle the listing
  * itself). Compaction rewrites the output as a controlled number of
  * range-partitioned files.
  *
  * The knob is ROWS per file, not bytes: a byte target needs a size
  * estimator (sampled row width × compression guess) whose error silently
  * doubles file counts across engines/codecs — callers map their known row
  * width to rows once, and the file count becomes exact and deterministic:
  * ceil(rows / rowsPerFile) files, range-partitioned by `keyCol` so each
  * file covers a contiguous key range (min/max footer stats make
  * downstream range predicates skip whole files — the same pruning story
  * as [[Partitioned]], one level finer).
  *
  * The reference has no storage layer; this is additive Spark-native
  * surface like [[Bucketing]].
  */
object Compaction {

  /** Rewrite `df` under `path` as exactly ceil(rows / rowsPerFile)
    * parquet files range-partitioned by `keyCol`. Returns the file count.
    * Costs one count (cheap columnar scan) + one range shuffle + the
    * write. */
  def writeRowBounded(
      df: DataFrame,
      path: String,
      keyCol: String,
      rowsPerFile: Long): Int = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val rows = df.count()
    val nFiles = math.max(1L, (rows + rowsPerFile - 1) / rowsPerFile).toInt
    df.repartitionByRange(nFiles, col(keyCol))
      .write.mode("overwrite").parquet(path)
    nFiles
  }
}
