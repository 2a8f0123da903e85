package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed tables must join without a shuffle exchange on either side —
  * the co-location contract that amortizes the big-join shuffle at scale. */
class BucketingSpec extends SparkSpecBase {

  import spark.implicits._

  test("bucketed join plans no ShuffleExchange") {
    val left = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("id", "l")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "r")
    Bucketing.saveBucketed(left, "bspec_left", "id", 4)
    Bucketing.saveBucketed(right, "bspec_right", "id", 4)
    val joined = Bucketing.bucketedJoin(spark, "bspec_left", "bspec_right", "id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join:\n$plan")
    assert(joined.count() === 1000)
    // correctness: same result as a plain join
    val plain = left.join(right, Seq("id")).agg(sum(col("r"))).head.getDouble(0)
    val bucketed = joined.agg(sum(col("r"))).head.getDouble(0)
    assert(plain === bucketed)
  }
}
