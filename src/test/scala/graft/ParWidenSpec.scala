package graft

import graft.functions.Par

/** Par.widen's scale contract: widen NARROW inputs to the cluster's
  * parallelism, but be the IDENTITY on anything already at least that wide
  * — at 100 TB the scan arrives with thousands of splits and an extra
  * repartition there would shuffle the whole input for nothing. */
class ParWidenSpec extends SparkSpecBase {

  import spark.implicits._

  test("narrow input widens to default parallelism") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions === 1)
    val widened = Par.widen(narrow)
    assert(widened.rdd.getNumPartitions === target)
    // content unchanged
    assert(widened.collect().map(_.getInt(0)).sorted.toSeq === (1 to 100))
  }

  test("already-wide input is returned untouched — no shuffle added") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(target + 3)
    val out = Par.widen(wide)
    // identity: the SAME DataFrame reference, not merely the same width —
    // widen must not insert any new plan node on the scale path
    assert(out eq wide)
  }
}
