package graft

import org.apache.spark.sql.functions._

/** Regression tripwire for the round-14 measurement-honesty fix: Bench and
  * ScaleDrill force query results through the query's OWN physical plan
  * (`queryExecution.toRdd`), never through a `count()` round-trip, because
  * Catalyst prunes operators a count doesn't reference — a window-ending
  * query (rowNumber) re-optimized to a bare scan-and-count and its timing
  * measured only the eager driver prep (caught when the drill's spill
  * census read ~0 shuffle bytes for kernels that must shuffle).
  *
  * The spec pins the distinction with the same task-metric census the
  * drill uses: on identical input, toRdd forcing must shuffle ~every row
  * through the window exchange while count() forcing shuffles only
  * aggregate partials. If someone "simplifies" the forcing back to
  * count(), the drill would silently under-measure again — this fails
  * loudly instead.
  */
class ForcingSpec extends SparkSpecBase {

  test("toRdd forcing executes the window exchange that count() prunes") {
    val sc = spark.sparkContext
    // force the bucket-stitch path (the drill's discipline) so the plan
    // carries a per-bucket window over a real exchange
    val gateKey = "spark.graft.globalWindow.maxBytes"
    val prevGate = spark.conf.getOption(gateKey)
    spark.conf.set(gateKey, "1")
    val mx = new org.apache.spark.GraftTaskMetrics
    mx.attach(sc)
    try {
      val n = 20000L
      val df = spark.range(n).select(
        col("id").as("k"), (col("id") % 97).cast("double").as("v"))
        .localCheckpoint(true)
      val ranked = operators.OrderedScan.rowNumber(df, "k", "__ord", buckets = 8)

      mx.reset(sc)
      assert(ranked.queryExecution.toRdd.count() === n)
      val forcedShuffle = mx.shuffleBytes(sc)

      mx.reset(sc)
      assert(ranked.count() === n)
      val countShuffle = mx.shuffleBytes(sc)

      // the forced plan moves every (k, v, bucket) row through the window
      // exchange (≥ ~16 bytes/row even compressed); the count plan's
      // shuffle is aggregate partials — orders of magnitude smaller
      assert(forcedShuffle > n * 8,
        s"toRdd forcing shuffled only $forcedShuffle bytes for $n rows — " +
          "the window exchange did not execute; forcing is being pruned")
      assert(forcedShuffle > 10L * math.max(countShuffle, 1L),
        s"toRdd forcing ($forcedShuffle B) should dwarf count() forcing " +
          s"($countShuffle B); if not, count() stopped pruning or forcing broke")
    } finally {
      sc.removeSparkListener(mx)
      prevGate match {
        case Some(v) => spark.conf.set(gateKey, v)
        case None    => spark.conf.unset(gateKey)
      }
    }
  }
}
