package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (one JVM, one session). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpecBase.session

  /** Build a two-column (k long, v double-nullable) series DataFrame. */
  def seriesDf(rows: (Long, java.lang.Double)*): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
  }

  /** Collect a (k, v) frame to a sorted Seq of (Long, Option[Double]). */
  def collectKV(df: DataFrame, k: String = "k", v: String = "v"): Seq[(Long, Option[Double])] =
    df.select(k, v).collect().toSeq
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)
}

object SparkSpecBase {
  /** Rebuilds after a stop: RecoverySpec proves cross-session index
    * recovery by genuinely stopping the SparkContext and building a FRESH
    * session over the same warehouse dir (fresh in-memory catalog — the
    * restart state). Suites run sequentially in the forked test JVM
    * (`Test / fork := true`, forked-parallel off), so later suites simply
    * get the rebuilt session from here. */
  def session: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      cached = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", 4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.extensions", "graft.plans.GraftExtensions")
        .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      cached.sparkContext.setLogLevel("WARN")
    }
    cached
  }
  @volatile private var cached: SparkSession = null
}
