package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc 100× profiling harness for the ordered_rank_str drill kernel
  * (r15 verdict #2): regenerates the drill's amplified lineitem series
  * ONCE into /tmp/graft_rankstr_li (reused across runs), then times the
  * kernel's segments separately so the payload-cut experiment optimizes
  * the measured bottleneck, not a guess. Test scope on purpose — not part
  * of the shipped library. Run exclusively (no concurrent sbt).
  *
  *   sbt -batch "Test/runMain graft.RankStrProfile [segments]"
  */
object RankStrProfile {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("rankstr-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.shuffle.sort.bypassMergeThreshold", 2048)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val x = sys.env.getOrElse("SPARK_GRAFT_DRILL_X", "100").toInt
    val liPath = s"/tmp/graft_rankstr_li_x$x"
    if (!new java.io.File(liPath + "/_SUCCESS").exists()) {
      ScaleDrill.amplifyLineitemSeries(spark, dir, x)
        .write.mode("overwrite").parquet(liPath)
      println(s"[profile] wrote $liPath")
    }
    val li = spark.read.parquet(liPath)
    val mx = new org.apache.spark.GraftTaskMetrics
    mx.attach(spark.sparkContext)

    def timed(name: String)(build: => DataFrame): Unit = {
      // drill-style quiesce-lite
      (1 to 3).foreach(_ => System.gc()); Thread.sleep(1500)
      mx.reset(spark.sparkContext)
      val t0 = System.nanoTime()
      val df = build
      val rows = df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-22s ${sec}%8.2f s  rows=$rows  ${mx.snapshot(spark.sparkContext)}")
    }

    val want: String => Boolean =
      if (args.isEmpty) _ => true else args.toSet.contains _

    val sel = li.select(md5(col("k").cast("string")).as("ks"))

    // segment 1: the kernel's input lineage alone (scan + md5)
    if (want("scan_md5")) timed("scan_md5")(sel)
    // segment 2: the sizing pass alone (prefix64 proxy + count/grid agg)
    if (want("sizing")) timed("sizing") {
      sel.withColumn("__kpfxd",
        graft.operators.OrderedScan.prefix64("ks").cast("double"))
        .agg(count(lit(1)).as("__n"),
          percentile_approx(col("__kpfxd"),
            typedLit((1 to 255).map(_.toDouble / 256)), lit(512)).as("__g"))
    }
    // segment 3: the full kernel (what the drill times)
    if (want("kernel")) timed("kernel") {
      graft.operators.OrderedScan.rowNumber(sel, "ks", "__ord")
    }
    spark.stop()
  }
}
