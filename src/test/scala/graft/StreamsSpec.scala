package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** The streaming wrappers must leave the caller's session untouched and
  * agree with the equivalent batch aggregation. */
class StreamsSpec extends SparkSpecBase {

  import spark.implicits._

  test("runToCompletion isolates its shuffle width from the caller's session") {
    val dir = java.nio.file.Files.createTempDirectory("graft_streams_spec").toString
    val events = (0 until 400).map { i =>
      (new java.sql.Timestamp(1700000000000L + i * 61000L),
        if (i % 3 == 0) "click" else "view", (i % 7).toDouble, i.toLong % 5)
    }.toDF("ts", "event_type", "value", "user_id")
    // testdata layout is one parquet FILE named events.parquet (the stream
    // source symlinks that file); extract the single part file
    events.coalesce(1).write.mode("overwrite").parquet(s"$dir/_out")
    val part = new java.io.File(s"$dir/_out").listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))

    val widthBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val got = Streams.tumblingByType(spark, dir, "1 hour")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // the stream ran with width 8 in a child session — the caller's width
    // must be untouched the whole time, not merely restored afterwards
    assert(spark.conf.get("spark.sql.shuffle.partitions") === widthBefore)

    val batch = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(unix_timestamp(col("window.start")).as("k"),
        col("event_type"), col("n"), round(col("total"), 4).as("total"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }
}
