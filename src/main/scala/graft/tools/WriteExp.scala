package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch experiment (r17 measurement): cost attribution of one bucketed
  * index-table write at sf0.1 — is the 0.6-1.2 s per saveAsTable the task
  * fan-out (32 tasks x 8 buckets = 256 tiny files), the sort, the commit,
  * or the catalog machinery? Compares write shapes on the same
  * materialized band table. Not part of the bench or any query path. */
object WriteExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", 2048)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Vectors
    val docs = graft.Tables(spark, sfDir, "documents").where(col("doc_id") % 7 =!= 0)
    // replicate publishLshIndex's band table: widen -> shingle -> explode
    val base = docs.select(col("doc_id").as("id"), col("text").as("__t"))
      .repartition(cpus.toInt)
      .select(col("id"), Vectors.shinglesFast(3)(col("__t")).as("shs"))
      .where(size(col("shs")) > 0)
      .localCheckpoint(true)
    val bk = base
      .select(col("id"), posexplode(Vectors.md5BandKeys(16, 4)(col("shs"))))
      .select(col("pos").as("band"), col("col").as("bk"), col("id"), lit(0L).as("ep"))
    println(s"base rows=${base.count()} partitions=${base.rdd.getNumPartitions}")

    def timed(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $tag%-34s ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
    }
    def drop(t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    // variant with band keys MATERIALIZED in the checkpoint (the md5
    // kernel runs wide during materialization; the write-side explode is
    // a cheap row expansion, safe to run at any write width)
    val base2 = docs.select(col("doc_id").as("id"), col("text").as("__t"))
      .repartition(cpus.toInt)
      .select(col("id"), Vectors.shinglesFast(3)(col("__t")).as("shs"))
      .where(size(col("shs")) > 0)
      .select(col("id"), col("shs"), Vectors.md5BandKeys(16, 4)(col("shs")).as("bks"))
      .localCheckpoint(true)
    val bk2 = base2
      .select(col("id"), posexplode(col("bks")))
      .select(col("pos").as("band"), col("col").as("bk"), col("id"), lit(0L).as("ep"))
    println("ckpt stats sizeInBytes=" + base2.queryExecution.optimizedPlan.stats.sizeInBytes)
    def loadNow(): Double = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      os.getSystemLoadAverage / os.getAvailableProcessors
    }
    for (rep <- 1 to 4) {
      println(f"== rep $rep (load/core ${loadNow()}%.3f) ==")
      drop("wexp_asis")
      timed("bucketBy(8) as-is (32 tasks)") {
        bk.write.bucketBy(8, "bk").sortBy("bk").format("parquet").saveAsTable("wexp_asis")
      }
      drop("wexp_m1")
      timed("materialized bks, coalesce(1)") {
        bk2.coalesce(1).write.bucketBy(8, "bk").sortBy("bk").format("parquet").saveAsTable("wexp_m1")
      }
      drop("wexp_m4")
      timed("materialized bks, coalesce(4)") {
        bk2.coalesce(4).write.bucketBy(8, "bk").sortBy("bk").format("parquet").saveAsTable("wexp_m4")
      }
      drop("wexp_c1")
      timed("unmaterialized, coalesce(1)") {
        bk.coalesce(1).write.bucketBy(8, "bk").sortBy("bk").format("parquet").saveAsTable("wexp_c1")
      }
      timed("noop 32-wide (compute only)") {
        bk.write.format("noop").mode("overwrite").save()
      }
      timed("noop coalesce(1) unmaterialized") {
        bk.coalesce(1).write.format("noop").mode("overwrite").save()
      }
      timed("noop coalesce(1) materialized") {
        bk2.coalesce(1).write.format("noop").mode("overwrite").save()
      }
    }
    Seq("wexp_asis", "wexp_m1", "wexp_m4").foreach { t =>
      println(s"$t files=${graft.sources.Bucketing.dataFileCount(spark, t)}")
    }
    // concurrent vs sequential multi-table publish (the PQ publish shape:
    // one corpus-sized narrow write + two model-sized writes)
    import spark.implicits._
    val centsDf = (for { c <- 0 until 8; d <- 0 until 8 } yield (c, d, c * 100L + d))
      .toDF("c", "d", "cv")
    val booksDf = (for { j <- 0 until 8; c <- 0 until 16; d <- 0 until 8 }
      yield (j, c, d, j * 1000L + c * 10L + d)).toDF("j", "code", "d", "cv")
    val assignNarrow = bk2.coalesce(1)
    for (rep <- 1 to 4) {
      println(f"== pub rep $rep (load/core ${loadNow()}%.3f) ==")
      Seq("wexp_pa", "wexp_pc", "wexp_pb").foreach(drop)
      timed("3 writes SEQUENTIAL") {
        graft.sources.Bucketing.saveBucketed(assignNarrow, "wexp_pa", "bk", 8)
        graft.sources.Bucketing.saveBucketed(centsDf, "wexp_pc", "c", 1)
        graft.sources.Bucketing.saveBucketed(booksDf, "wexp_pb", "j", 1)
      }
      Seq("wexp_pa", "wexp_pc", "wexp_pb").foreach(drop)
      timed("3 writes CONCURRENT") {
        import scala.concurrent.Future
        import scala.concurrent.ExecutionContext.Implicits.global
        val fs = Seq(
          Future(graft.sources.Bucketing.saveBucketed(assignNarrow, "wexp_pa", "bk", 8)),
          Future(graft.sources.Bucketing.saveBucketed(centsDf, "wexp_pc", "c", 1)),
          Future(graft.sources.Bucketing.saveBucketed(booksDf, "wexp_pb", "j", 1)))
        graft.functions.Par.awaitAllSettled(fs: _*)
      }
    }
    spark.stop()
  }
}
