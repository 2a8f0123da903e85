package graft

import org.apache.spark.sql.functions._

/** The NanGuardPushdown rule must preserve reference NaN-as-missing filter
  * semantics exactly while re-enabling parquet predicate pushdown. */
class NanGuardSpec extends SparkSpecBase {

  test("filters over canonicalized columns still drop NaN rows") {
    val withNan = Tables.canonical(
      seriesDf((1L, 5.0), (2L, Double.NaN), (3L, 50.0), (4L, null)))
    // NaN >= x would be TRUE under Spark NaN ordering — the guard must keep
    // the canonicalized (missing) semantics where the row is dropped
    assert(collectKV(withNan.where(col("v") >= 1.0)) ===
      Seq((1L, Some(5.0)), (3L, Some(50.0))))
    assert(collectKV(withNan.where(col("v") < 10.0)) === Seq((1L, Some(5.0))))
    assert(collectKV(withNan.where(col("v").isNull)) ===
      Seq((2L, None), (4L, None)))
  }

  test("pushdown reaches the parquet scan through canonicalization") {
    val dir = java.nio.file.Files.createTempDirectory("graft_nan").toString
    seriesDf((1L, 1.0), (2L, Double.NaN), (3L, 3.0))
      .write.mode("overwrite").parquet(dir)
    val df = Tables.canonical(spark.read.parquet(dir)).where(col("v") >= 2.0)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("GreaterThanOrEqual(v,2.0)"),
      s"expected pushed filter in plan:\n$physical")
    assert(collectKV(df) === Seq((3L, Some(3.0))))
  }
}
