package graft

import org.apache.spark.sql.functions._

/** The reference's lazy-source tests assert which queries reach the loader
  * (spy recorder, reference tests/FSharp.DataFrame.Tests/LazySeries.fs:30-90).
  * The Catalyst equivalents: predicates/columns/partitions that reach the
  * scan are visible in the physical plan — asserted here. */
class PushdownSpec extends SparkSpecBase {

  import spark.implicits._

  test("column pruning: scan reads only projected columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    (1 to 100).map(i => (i.toLong, i * 2.0, s"s$i", i % 7))
      .toDF("a", "b", "c", "d").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select(col("a"), col("b") * 2)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<a:bigint,b:double>"), s"plan:\n$scan")
  }

  test("partition pruning: filter on the partition column prunes at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (1 to 100).map(i => (i.toLong, i % 5))
      .toDF("v", "p").write.mode("overwrite").partitionBy("p").parquet(dir)
    val df = spark.read.parquet(dir).where(col("p") === 3)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(p"), s"plan:\n$scan")
    assert(df.count() === 20)
  }

  test("range predicate on a sliced series reaches PushedFilters (DelayedSeries range pushdown analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_range").toString
    (1 to 1000).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val s = graft.core.KSeries(spark.read.parquet(dir), ordered = true)
    val sliced = s.between(lit(100L), lit(200L))
    val scan = sliced.df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(k,100)") && scan.contains("LessThanOrEqual(k,200)"),
      s"plan:\n$scan")
  }

  test("Partitioned.ensurePartitionedDir: writes once, date filter prunes to listed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hivepart").toString + "/t"
    val df = (1 to 90).map(i => (i.toLong, s"d${i % 9}"))
      .toDF("v", "day")
    graft.sources.Partitioned.ensurePartitionedDir(df, dir, "day")
    val marker = java.nio.file.Path.of(dir, "_SUCCESS")
    val t0 = java.nio.file.Files.getLastModifiedTime(marker)
    // second call is a no-op (the _SUCCESS marker short-circuits)
    graft.sources.Partitioned.ensurePartitionedDir(df.limit(1), dir, "day")
    assert(java.nio.file.Files.getLastModifiedTime(marker) === t0, "rewrote an existing layout")
    val read = spark.read.parquet(dir).where(col("day").isin("d3", "d4"))
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: ["), s"plan:\n$scan")
    assert(scan.contains("day#") && scan.contains("IN (d3,d4)") || scan.contains("day IN"),
      s"partition filter not pushed:\n$scan")
    assert(read.count() === 20)
    // dynamic proof: only the two matching day-directories are scanned
    import org.apache.spark.sql.execution.FileSourceScanExec
    val files = read.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.relation.location.inputFiles.length
    }
    // inputFiles is the UNPRUNED listing; the pruned selection is what the
    // scan string's PartitionFilters guarantee — assert the layout really
    // has 9 day dirs so the 2-dir selection is a genuine subset
    assert(files.headOption.exists(_ >= 9), s"expected >=9 partition files, got $files")
  }

  test("CSV missing tokens map to null like the reference's NaN,NA,#N/A set (FrameUtils.fs:196-205)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "in.csv"),
      "a,b\n1,1.5\n2,NA\n3,2.5\n")
    val df = spark.read
      .option("header", "true").option("inferSchema", "true")
      .option("nullValue", "NA")
      .csv(dir + "/in.csv")
    assert(df.schema("b").dataType === org.apache.spark.sql.types.DoubleType)
    val got = df.orderBy("a").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1))).toSeq
    assert(got === Seq(Some(1.5), None, Some(2.5)))
    // and the null-skipping aggregate ignores it
    assert(df.agg(avg(col("b"))).head.getDouble(0) === 2.0)
  }
}
