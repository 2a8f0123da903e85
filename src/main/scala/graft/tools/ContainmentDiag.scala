package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import graft.ScaleDrill

/** Throwaway diagnostic for the containment_pairs superlinear 20x->50x
  * drill step: times each pipeline segment separately and prints the
  * band-bucket census so the hot term is identified by measurement.
  */
object ContainmentDiag {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (x <- Seq(20, 50)) {
      println(s"===== x=$x =====")
      val docs = ScaleDrill.amplifyDocs(spark, dir, x).localCheckpoint(true)
      def t[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"  $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
      }
      // segment 1: shingle + band keys (the shingleBase + md5BandKeys kernels)
      val base = t("shingleBase") {
        val b = graft.functions.Par.widen(docs.select(col("doc_id").as("id"), col("text").as("__t")))
          .select(col("id"), graft.functions.Vectors.shinglesFast(3)(col("__t")).as("shs"))
          .where(size(col("shs")) > 0)
          .localCheckpoint(true)
        b.count(); b
      }
      val bk = t("bandKeys") {
        val b = base
          .select(col("id"), posexplode(graft.functions.Vectors.md5BandKeys(16, 4)(col("shs"))))
          .select(col("id"), col("pos").as("band"), col("col").as("bk"))
          .localCheckpoint(true)
        b.count(); b
      }
      t("bucketCensus") {
        val c = bk.groupBy(col("band"), col("bk")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("buckets"), max(col("n")).as("max_n"),
            sum(col("n") * (col("n") - 1) / 2).as("sum_pairs")).collect()(0)
        println(s"    buckets=${c.get(0)} max_bucket=${c.get(1)} cand_pairs_with_dups=${c.get(2)}")
      }
      val cand = t("candidates") {
        val c = bk
          .join(bk.withColumnRenamed("id", "id2"), Seq("band", "bk"))
          .where(col("id") < col("id2"))
          .select(col("id").as("id_a"), col("id2").as("id_b"))
          .distinct()
          .localCheckpoint(true)
        println(s"    n_cand=${c.count()}"); c
      }
      t("verify") {
        val sets = base.select(col("id"), col("shs").as("tok"))
        val scored = cand
          .join(sets.select(col("id").as("id_a"), col("tok").as("tok_a")), Seq("id_a"))
          .join(sets.select(col("id").as("id_b"), col("tok").as("tok_b")), Seq("id_b"))
          .withColumn("inter", size(array_intersect(col("tok_a"), col("tok_b"))).cast("long"))
        val aInB = scored.select(col("id_a").as("contained_id"), col("id_b").as("container_id"),
          expr("inter * 1000000 DIV size(tok_a)").as("containment_ppm"))
        val bInA = scored.select(col("id_b").as("contained_id"), col("id_a").as("container_id"),
          expr("inter * 1000000 DIV size(tok_b)").as("containment_ppm"))
        val n = aInB.unionByName(bInA).where(col("containment_ppm") >= 500000L).count()
        println(s"    n_out=$n")
      }
    }
    spark.stop()
  }
}
