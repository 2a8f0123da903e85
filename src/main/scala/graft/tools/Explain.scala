package graft.tools
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      println(s"==== $name ====")
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
