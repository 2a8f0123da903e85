package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join must be result-identical to the plain join while spreading a
  * hot key over `salts` sub-partitions. */
class SkewSpec extends SparkSpecBase {

  import spark.implicits._

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // thresholds lowered so the local-scale demo triggers the same
    // OptimizeSkewedJoin rule that handles genuine skew at 100 TB
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 carries half the left side with fat payloads
      val left = (0 until 40000).map { i =>
        (if (i % 2 == 0) 0L else (i % 997).toLong, "x" * 60 + i)
      }.toDF("k", "pad")
      val right = (0L until 997L).map(i => (i, i * 2)).toDF("k", "w")
      // global aggregate over pad: keeps the fat payload in the shuffle AND
      // imposes no output partitioning — a groupBy(k) downstream would make
      // AQE skip the skew split (it would cost an extra shuffle; see
      // spark.sql.adaptive.forceOptimizeSkewedJoin)
      val j = left.join(right, "k").agg(sum(length(col("pad"))))
      j.collect() // run so AQE finalizes the plan
      // QueryStageExec and AdaptiveSparkPlanExec are LEAVES — recurse into
      // their stage plans explicitly or collect() sees nothing
      def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => p +: flatten(q.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val fin = flatten(j.queryExecution.executedPlan)
      val smjs = fin.collect { case s: SortMergeJoinExec => s }
      assert(smjs.nonEmpty, s"expected a sort-merge join in:\n$fin")
      assert(smjs.exists(_.isSkewJoin), s"AQE did not mark the join skewed:\n${fin.mkString("\n")}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join equals plain join on skewed data") {
    // hot key 1 carries 90% of the left side
    val left = ((1 to 900).map(i => (1L, s"v$i")) ++
      (1 to 100).map(i => ((i % 7 + 2).toLong, s"w$i"))).toDF("k", "payload")
    val right = (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("k", "dim")

    val plain = left.join(right, Seq("k")).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("dim")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(left, right, "k", salts = 8).groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("dim")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === plain)
  }

  test("left join keeps unmatched rows under salting") {
    val left = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "payload")
    val right = Seq((1L, 1.0)).toDF("k", "dim")
    val r = Skew.saltedJoin(left, right, "k", salts = 4, joinType = "left")
      .collect().map(x => (x.getLong(0), x.isNullAt(2))).toSet
    assert(r === Set((1L, false), (99L, true)))
  }
}
