package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement (r17): per-call driver-side cost of the common
  * paths every query pays — (1) `Tables()` parquet relation re-resolution
  * (file listing is cached per session; footer/schema read is not), and
  * (2) `Par.widen`'s `df.rdd.getNumPartitions` physical planning. Decides
  * whether a relation memo / width memo is worth anything suite-wide.
  * Not on any query path. */
object MiscExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.names.foreach(n => graft.Tables(spark, sfDir, n).count())

    def timed(tag: String, n: Int)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      var i = 0; while (i < n) { f; i += 1 }
      println(f"  $tag%-44s ${(System.nanoTime() - t0) / 1e6 / n}%8.2f ms/call (n=$n)")
    }
    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      timed("Tables(documents) build only", 50) {
        graft.Tables(spark, sfDir, "documents")
      }
      timed("Tables(lineitem) build only", 50) {
        graft.Tables(spark, sfDir, "lineitem")
      }
      timed("Tables(documents) + analyzed", 50) {
        graft.Tables(spark, sfDir, "documents").queryExecution.analyzed
      }
      timed("Tables(documents) select+filter + toRdd plan", 30) {
        graft.Tables(spark, sfDir, "documents")
          .where(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text"))
          .queryExecution.toRdd
      }
      timed("widen probe: scan-proj rdd.getNumPartitions", 30) {
        graft.Tables(spark, sfDir, "documents")
          .select(col("doc_id").as("id"), col("text").as("__t"))
          .rdd.getNumPartitions
      }
    }
    spark.stop()
  }
}
