package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join must be result-identical to the plain join while spreading a
  * hot key over `salts` sub-partitions. */
class SkewSpec extends SparkSpecBase {

  import spark.implicits._

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
